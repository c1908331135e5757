"""Interleaved A/B of index-build throughput: HEAD vs a baseline commit.

The sandbox host's wall-clock variance (±70%, BENCH/BASELINE.md) makes
single bench runs meaningless for regression calls — three runs of
byte-identical round-2 code spanned 26/39/59 s. The only fair methodology
is INTERLEAVING: alternate baseline/HEAD runs in fresh JVMs on the same
host within the same window, then compare best-of-N (best-of filters the
throttling tail; the interleave cancels slow drift).

Usage:
    python tools/bench_ab.py [baseline_commit] [n_rounds] [n_pages]

Writes BENCH/AB_<tag>.md (AB_OUT_TAG env, default r03) and prints one JSON line. The baseline tree is
checked out to a git worktree under /tmp (read-only use).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = r"""
import json, os, shutil, sys, tempfile, time
tree = sys.argv[1]
n_pages = int(sys.argv[2])
sys.path.insert(0, tree)
from search_engine_spark.session import get_spark
from search_engine_spark.sources.synth import synth_pages
from search_engine_spark.operators.index_build import IndexConfig, write_index
spark = get_spark("ab", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
pages_dir = tempfile.mkdtemp(prefix="ab_pages_")
index_dir = tempfile.mkdtemp(prefix="ab_ix_")
try:
    synth_pages(spark, n_pages, partitions=64) \
        .write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"}, n_buckets=32)
    t0 = time.time()
    write_index(pages, index_dir, cfg)
    dt = time.time() - t0
    print(json.dumps({"build_s": round(dt, 2),
                      "docs_per_sec": round(n_pages / dt, 1)}))
finally:
    shutil.rmtree(pages_dir, ignore_errors=True)
    shutil.rmtree(index_dir, ignore_errors=True)
    spark.stop()
"""


def one_run(tree: str, n_pages: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET, tree, str(n_pages)],
        capture_output=True, text=True, timeout=900)
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"run in {tree} produced no JSON:\n{out.stderr[-2000:]}")


def main():
    baseline = sys.argv[1] if len(sys.argv) > 1 else "33379e6"
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_pages = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    wt = f"/tmp/ab_baseline_{baseline}"
    if not os.path.isdir(wt):
        subprocess.run(["git", "worktree", "add", "--detach", wt, baseline],
                       cwd=REPO, check=True, capture_output=True)
    results = {"baseline": [], "head": []}
    # alternate order each round (ABBA...) so slow drift cancels
    for i in range(n_rounds):
        order = [("baseline", wt), ("head", REPO)] if i % 2 == 0 \
            else [("head", REPO), ("baseline", wt)]
        for name, tree in order:
            r = one_run(tree, n_pages)
            r["at"] = round(time.time(), 1)
            results[name].append(r)
            print(f"round {i + 1} {name}: {r['build_s']} s "
                  f"({r['docs_per_sec']} docs/s)", file=sys.stderr)
    summary = {}
    for name in ("baseline", "head"):
        ts = [r["build_s"] for r in results[name]]
        summary[name] = {
            "runs_s": ts, "best_s": min(ts),
            "median_s": round(statistics.median(ts), 2),
            "best_docs_per_sec": round(n_pages / min(ts), 1),
        }
    summary["head_vs_baseline_best"] = round(
        summary["baseline"]["best_s"] / summary["head"]["best_s"], 3)
    # within-round pair ratios (head_s / baseline_s): each ratio compares
    # two runs adjacent in time, so host drift cancels PER PAIR, and the
    # median is robust to single-run outliers that hijack best-of (a
    # hypervisor burst can hand one side a lucky 23 s run and the other a
    # 59 s stall in the same round). This is the load-bearing number;
    # best-of stays for cross-round comparability.
    pair_ratios = [
        round(h["build_s"] / b["build_s"], 3)
        for h, b in zip(results["head"], results["baseline"])]
    summary["pair_ratios_head_over_baseline"] = pair_ratios
    summary["pair_ratio_median"] = round(statistics.median(pair_ratios), 3)
    out = {"n_pages": n_pages, "baseline_commit": baseline,
           "interleaved_rounds": n_rounds, **summary}
    print(json.dumps(out))

    md = [
        "# Interleaved A/B: index-build throughput (HEAD vs baseline)",
        "",
        f"- corpus: {n_pages} synthetic pages, `write_index` end-to-end "
        "(postings + stats + meta), fresh JVM per run",
        f"- baseline commit: `{baseline}`",
        f"- methodology: {n_rounds} interleaved rounds, ABBA order, "
        "best-of compared (host variance ±70% — see BASELINE.md)",
        "",
        "| side | runs (s) | best (s) | median (s) | best docs/s |",
        "|---|---|---|---|---|",
    ]
    for name in ("baseline", "head"):
        s = summary[name]
        md.append(f"| {name} | {', '.join(str(x) for x in s['runs_s'])} | "
                  f"{s['best_s']} | {s['median_s']} | "
                  f"{s['best_docs_per_sec']} |")
    md += ["",
           f"**speedup (baseline best / head best): "
           f"{summary['head_vs_baseline_best']}×**", "",
           f"**within-round pair ratios (head/baseline, lower = head "
           f"faster): {summary['pair_ratios_head_over_baseline']} — "
           f"median {summary['pair_ratio_median']}×** (robust to the "
           "single-run outliers best-of is hostage to)", ""]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    tag = os.environ.get("AB_OUT_TAG", "r03")
    with open(os.path.join(REPO, "BENCH", f"AB_{tag}.md"), "w") as fh:
        fh.write("\n".join(md))


if __name__ == "__main__":
    main()
