"""Steady-state lifecycle endurance (round-5, VERDICT item 6).

Drives the REAL facade path for N append → auto-persist cycles with
periodic flushes — the consolidation story measured at depth, not one
cycle: if the incremental snapshot machinery leaked O(index) work or
unbounded delta files anywhere, cycle ~100 would be visibly slower than
cycle 1 and the artifact dirs would grow without bound.

Per cycle: POST-shaped add_documents of BATCH docs (auto-persist
refreshes blocks + doc-values sidecar), recording wall time, delta-file
counts, live-run counts, and a cold-serving topk probe every 10 cycles.
Every FLUSH_EVERY cycles: svc.flush (compact_runs + bucket-scoped
refresh). Auto-persist consolidation (consolidate_after) is ON — file
counts must stay bounded by it.

Output: one JSON line + BENCH/LIFECYCLE.md (cycle-decile medians).

Usage: python tools/bench_endurance.py  [N_CYCLES]
Env: BENCH_PAGES (base corpus, default 20000), SPARK_GRAFT_CPUS (8),
     ENDURANCE_BATCH (docs per cycle, default 100),
     ENDURANCE_FLUSH_EVERY (default 25).
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from search_engine_spark.server import SearchService  # noqa: E402
from search_engine_spark.serving import ServingIndex  # noqa: E402
from search_engine_spark.session import get_spark  # noqa: E402
from search_engine_spark.sources.synth import synth_pages  # noqa: E402


def _file_counts(ixdir: str) -> dict:
    return {
        "blocks_files": len(glob.glob(
            os.path.join(ixdir, "blocks", "**", "*.parquet"),
            recursive=True)),
        "dv_files": len(glob.glob(
            os.path.join(ixdir, "doc_values", "**", "*.parquet"),
            recursive=True)),
        "live_runs": sum(1 for _ in glob.glob(
            os.path.join(ixdir, "runs", "*"))),
        "docs_runs_chunks": len(glob.glob(
            os.path.join(ixdir, "docs_runs", "*"))),
    }


def main():
    n_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_pages = int(os.environ.get("BENCH_PAGES", "20000"))
    batch_n = int(os.environ.get("ENDURANCE_BATCH", "100"))
    flush_every = int(os.environ.get("ENDURANCE_FLUSH_EVERY", "25"))
    spark = get_spark("bench-endurance", cores=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="se_endurance_")
    pages_dir = os.path.join(root, "pages")
    synth_pages(spark, n_pages, partitions=32).write.parquet(pages_dir)
    svc = SearchService(spark, root,
                        auto_persist={"enabled": True, "batch_size": 1,
                                      "consolidate_after": 16})
    svc.create_index("web", pages_dir, fields={"text": "text"})
    svc.snapshot("web")
    ixdir = svc.catalog._dir("web")

    cycle_s, flush_s, probes, counts = [], [], [], []
    next_id = n_pages
    for c in range(1, n_cycles + 1):
        docs = [{"doc_id": next_id + i,
                 "text": f"endurance cycle{c} tok{(next_id + i) % 97} "
                         f"payload common words"}
                for i in range(batch_n)]
        next_id += batch_n
        t0 = time.time()
        svc.add_documents("web", docs)   # append + auto-persist refresh
        cycle_s.append(time.time() - t0)
        if c % flush_every == 0:
            t0 = time.time()
            svc.flush("web")
            flush_s.append(round(time.time() - t0, 3))
        if c % 10 == 0 or c == 1:
            fc = _file_counts(ixdir)
            fc["cycle"] = c
            counts.append(fc)
            s = ServingIndex(ixdir)      # cold instance
            t0 = time.time()
            s.topk("text", [f"cycle{max(1, c - 1)}"], k=10)
            probes.append({"cycle": c,
                           "cold_topk_ms": round(1000 * (time.time() - t0),
                                                 2)})
        print(f"cycle {c}: {cycle_s[-1]:.2f}s", file=sys.stderr)

    # totals must be exact after 100 cycles of mutation
    total = svc.search("web", {"query": {"match_all": {}}, "size": 1})
    assert total["total"] == n_pages + n_cycles * batch_n, total["total"]

    def med(xs):
        return round(statistics.median(xs), 3) if xs else None

    # Per-cycle cost is a SAWTOOTH in runs-since-last-flush (each cycle
    # appends one LSM run; the union view and the pruned dedup read pay
    # per live run until the flush folds them), so flat-ness must be
    # judged between SAME-PHASE windows — the first K cycles after an
    # early flush vs after a late one — not between raw deciles.
    first = cycle_s[:10]
    mid = cycle_s[len(cycle_s) // 2 - 5: len(cycle_s) // 2 + 5]
    last = cycle_s[-10:]
    phase_windows = {}
    for f in range(0, n_cycles, flush_every):
        if f + 10 <= n_cycles:
            phase_windows[f"cycles_{f + 1}-{f + 10}"] = med(
                cycle_s[f:f + 10])
    out = {
        "n_pages": n_pages, "cycles": n_cycles, "batch": batch_n,
        "cpus": cpus, "flush_every": flush_every,
        "cycle_p50_first10_s": med(first),
        "cycle_p50_mid10_s": med(mid),
        "cycle_p50_last10_s": med(last),
        "post_flush_phase_p50_s": phase_windows,
        "cycle_s": [round(c, 3) for c in cycle_s],
        "flush_s": flush_s,
        "probes": probes,
        "file_counts": counts,
        "final_total_docs": total["total"],
    }
    print(json.dumps(out))

    md = [
        "# Lifecycle endurance (steady-state, round 5)",
        "",
        f"{n_cycles} cycles of `add_documents({batch_n} docs)` with "
        f"auto-persist (batch_size=1, consolidate_after=16) over a "
        f"{n_pages}-page base index; `flush` every {flush_every} "
        f"cycles; `local[{cpus}]`.",
        "",
        "| metric | first 10 cycles | mid 10 | last 10 |",
        "|---|---|---|---|",
        f"| append+refresh p50 (s) | {med(first)} | {med(mid)} "
        f"| {med(last)} |",
        "",
        "Per-cycle cost is a sawtooth in runs-since-last-flush (each "
        "cycle appends one run; the union view pays per live run until "
        "the flush folds them), so flatness is judged between "
        "SAME-PHASE windows — the 10 cycles following each flush:",
        "",
        "| window | p50 (s) |",
        "|---|---|",
        *[f"| {k} | {v} |" for k, v in phase_windows.items()],
        "",
        "| cycle | blocks files | dv files | live runs | docs_runs |"
        " cold topk (ms) |",
        "|---|---|---|---|---|---|",
    ]
    probe_by_cycle = {p["cycle"]: p["cold_topk_ms"] for p in probes}
    for fc in counts:
        md.append(f"| {fc['cycle']} | {fc['blocks_files']} "
                  f"| {fc['dv_files']} | {fc['live_runs']} "
                  f"| {fc['docs_runs_chunks']} "
                  f"| {probe_by_cycle.get(fc['cycle'], '')} |")
    md += [
        "",
        f"Flushes (s): {flush_s}",
        "",
        f"Final match_all total: {total['total']} (exact: base "
        f"{n_pages} + {n_cycles}x{batch_n}).",
        "",
        "Reading: the per-cycle cost and the cold-probe latency must be "
        "FLAT in the cycle number (each cycle is O(batch): pruned dedup "
        "read, run append, delta refresh), and the artifact file counts "
        "must stay bounded by consolidate_after + the bucket count — "
        "not grow with the cycle count.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "LIFECYCLE.md"), "w") as fh:
        fh.write("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
