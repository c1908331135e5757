"""Exhaustive crash-point sweep over a maintenance op's file operations.

The randomized soak (soak_lifecycle.py) samples crash points; this tool
enumerates them: it rebuilds a small index with a representative mutation
mix (appends, a double upsert, a delete, a re-add), then runs the target
op with an injected crash at file-op #k for EVERY k until the op
completes, asserting after each crash that

  - the index stays readable (load_index / routed search),
  - a replay of the op completes, and
  - the final state matches the model (live ids, generations, scores).

Usage:  python tools/sweep_crash_points.py [flush|snapshot|compact_deletes|consolidate] ...
        (no args = all four)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from soak_lifecycle import InjectedCrash, _FaultInjector, _doc, _text


def build_state(spark, root):
    """Index + mutation mix with every lifecycle feature live:
    docs 0-5 base; 6,7 appended; 0 upserted twice (superseded run gen);
    1 deleted; 2 deleted then re-added (gen 1)."""
    from search_engine_spark.operators.delete import delete_docs
    from search_engine_spark.server import SearchService
    docs = spark.createDataFrame([_doc(i, 0) for i in range(6)],
                                 "doc_id long, text string, lang string")
    dp = os.path.join(root, "docs")
    docs.write.parquet(dp)
    svc = SearchService(spark, os.path.join(root, "ix"))
    svc.create_index("s", dp, fields={"text": "text"})
    svc.snapshot("s")
    ixdir = svc.catalog._dir("s")
    svc.add_documents("s", [_doc(6, 0), _doc(7, 0)])
    svc.add_documents("s", [_doc(0, 1)])
    svc.add_documents("s", [_doc(0, 2)])
    delete_docs(spark, ixdir, [1, 2])
    svc.add_documents("s", [_doc(2, 1)])
    live = {0: 2, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0}
    return svc, ixdir, live


def check_state(svc, live, where):
    from search_engine_spark.functions.bm25 import bm25_score_py
    res = svc.search("s", {"query": {"match_all": {}}, "size": 1})
    assert res["total"] == len(live), \
        f"{where}: total {res['total']} != {len(live)}"
    for i, gen in sorted(live.items()):
        got = svc.search("s", {"query": {"term": {
            "field": "text", "value": f"v{i}x{gen}"}}, "size": 3})
        assert got["total"] == 1 and got["hits"][0]["doc_id"] == i, \
            f"{where}: doc {i} gen {gen} -> {got['total']}"
        want = bm25_score_py(1, 1, 4, len(live), 4.0)
        assert abs(got["hits"][0]["score"] - want) <= 1e-9 * want, \
            f"{where}: doc {i} score {got['hits'][0]['score']} != {want}"
        if gen:
            old = svc.search("s", {"query": {"term": {
                "field": "text", "value": f"v{i}x{gen - 1}"}}, "size": 3})
            assert old["total"] == 0, f"{where}: doc {i} stale gen matches"
    dead = svc.search("s", {"query": {"term": {
        "field": "text", "value": "u1"}}, "size": 3})
    assert dead["total"] == 0, f"{where}: deleted doc 1 matches"


def run_op(svc, ixdir, name):
    from search_engine_spark.operators.delete import compact_deletes
    from search_engine_spark.operators.doc_values import \
        consolidate_doc_values
    from search_engine_spark.operators.lsm import consolidate_docs_runs
    from search_engine_spark.operators.wand import consolidate_blocks
    if name == "flush":
        svc.flush("s")
    elif name == "snapshot":
        svc.snapshot("s")
    elif name == "compact_deletes":
        compact_deletes(svc.spark, ixdir)
    elif name == "consolidate":
        consolidate_blocks(svc.spark, ixdir, min_files=1)
        consolidate_doc_values(svc.spark, ixdir, min_delta_files=1)
        consolidate_docs_runs(svc.spark, ixdir, min_chunks=2)
    else:
        raise ValueError(name)


def sweep(spark, op: str, max_k: int = 120) -> tuple:
    from search_engine_spark.server import SearchService
    crashed = 0
    k = 1
    while k <= max_k:
        root = tempfile.mkdtemp(prefix=f"sweep_{op}_{k}_")
        try:
            svc, ixdir, live = build_state(spark, root)
            if op == "consolidate":
                # consolidation needs DELTA files to fold — snapshot the
                # appended runs first (outside the injector: snapshot has
                # its own sweep). Without this the op no-ops and the
                # sweep silently covers zero crash points.
                svc.snapshot("s")
            try:
                with _FaultInjector(k):
                    run_op(svc, ixdir, op)
                check_state(svc, live, f"{op} complete at k={k}")
                return crashed, k - 1  # op finished: every point swept
            except InjectedCrash:
                crashed += 1
                svc = SearchService(spark, os.path.join(root, "ix"))
                check_state(svc, live, f"{op} crash@{k} pre-replay")
                run_op(svc, ixdir, op)  # replay
                check_state(svc, live, f"{op} crash@{k} post-replay")
        finally:
            shutil.rmtree(root, ignore_errors=True)
        k += 1
    raise AssertionError(f"{op}: more than {max_k} file ops?")


def main():
    from search_engine_spark.session import get_spark
    ops = sys.argv[1:] or ["flush", "snapshot", "compact_deletes",
                           "consolidate"]
    spark = get_spark("sweep", cores=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")), shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import time
    for op in ops:
        t0 = time.time()
        crashed, points = sweep(spark, op)
        print(f"{op}: {points} crash points swept "
              f"({crashed} crashes injected, {time.time() - t0:.0f}s)",
              flush=True)
    print("ALL SWEEPS PASSED")
    spark.stop()


if __name__ == "__main__":
    main()
