"""Sustained serving throughput, 1 vs N workers (reference: >1,000 q/s
"with workers", README.md:209 — worker_threads with per-worker engines).

    python tools/bench_qps.py <index_dir> [n_workers] [seconds]

Each worker is a PROCESS with its own ServingIndex handle over the same
immutable artifacts (the Spark-native analog of the reference's worker
pool; Python threads would serialize on the GIL for sub-ms queries).
Workers run the same warm mixed-operator loop (term/match/bool/phrase)
with the result cache OFF — compute throughput, not LRU hits — and
report aggregate q/s. Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def query_mix(srv, mode: str = "heavy"):
    """Deterministic warm mix from the dictionary. ``heavy`` = term/match/
    bool/phrase incl. head×head phrase (worst realistic request); ``light``
    = simple term/bool lookups — the shape behind the reference's
    <10 ms / >1,000 q/s claims."""
    terms, dfs = srv._dictionary("text")
    import numpy as np
    order = np.argsort(-dfs, kind="stable")
    head1, head2 = str(terms[order[0]]), str(terms[order[1]])
    mid = str(terms[order[min(len(order) - 1, 1000)]])
    tail = str(terms[order[min(len(order) - 1, len(order) // 2)]])
    if mode == "light":
        return [
            {"term": {"field": "text", "value": head1}},
            {"term": {"field": "text", "value": mid}},
            {"term": {"field": "text", "value": tail}},
            {"bool": {"must": [{"term": {"field": "text", "value": mid}}],
                      "should": [{"term": {"field": "text",
                                           "value": tail}}]}},
        ]
    return [
        {"term": {"field": "text", "value": head1}},
        {"term": {"field": "text", "value": mid}},
        {"match": {"field": "text", "value": f"{head2} {mid}"}},
        {"bool": {"must": [{"term": {"field": "text", "value": head1}}],
                  "should": [{"term": {"field": "text", "value": head2}},
                             {"term": {"field": "text", "value": mid}}]}},
        {"match_phrase": {"field": "text", "value": f"{head1} {head2}"}},
    ]


def worker(index_dir: str, seconds: float, out_q, mode: str):
    from search_engine_spark.serving import ServingIndex
    srv = ServingIndex(index_dir)
    mix = query_mix(srv, mode)  # reuse the handle — one open per worker
    for q in mix:  # warm postings/keys
        srv.search(q, k=10, use_cache=False)
    n = 0
    t_end = time.time() + seconds
    while time.time() < t_end:
        srv.search(mix[n % len(mix)], k=10, use_cache=False)
        n += 1
    out_q.put(n)


def run(index_dir: str, n_workers: int, seconds: float,
        mode: str) -> tuple:
    ctx = mp.get_context("spawn")
    out_q = ctx.Queue()
    procs = [ctx.Process(target=worker, args=(index_dir, seconds, out_q, mode))
             for _ in range(n_workers)]
    t0 = time.time()
    for p in procs:
        p.start()
    total = 0
    for _ in procs:
        try:  # a worker that died before reporting must FAIL the bench,
            # not hang it forever on a queue that will never fill
            total += out_q.get(timeout=seconds + 120)
        except Exception:
            for p in procs:
                p.terminate()
            raise RuntimeError(
                "a worker exited without reporting (crashed during "
                "open/warm?) — check the index dir and mix")
    for p in procs:
        p.join()
    wall = time.time() - t0
    # subtract nothing: wall includes per-process open+warm (~1-2 s) —
    # reported q/s is therefore conservative
    return total / max(wall, 1e-9), total, wall


def main():
    index_dir = sys.argv[1]
    n_workers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    mode = sys.argv[4] if len(sys.argv) > 4 else "heavy"
    qps1, n1, w1 = run(index_dir, 1, seconds, mode)
    qpsn, nn, wn = run(index_dir, n_workers, seconds, mode)
    print(json.dumps({
        "metric": "serving_qps_workers",
        "index_dir": index_dir, "mode": mode,
        "seconds_per_leg": seconds,
        "qps_1worker": round(qps1, 1),
        "qps_n_workers": round(qpsn, 1),
        "n_workers": n_workers,
        "speedup": round(qpsn / max(qps1, 1e-9), 2),
        "queries_1": n1, "queries_n": nn,
    }))


if __name__ == "__main__":
    main()
