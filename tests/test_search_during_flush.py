"""Reads racing a live flush must never flicker.

The flush_inflight marker brackets compact_runs' fold; a search thread
hammering the routed path while the main thread upserts and flushes
asserts the doc count and the upserted doc's generation stay exact at
every observation — the real-time twin of the crash-point sweep's
pre-replay checks."""

from __future__ import annotations

import threading

from search_engine_spark.server import SearchService


def test_totals_stable_while_flushing(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha shared body{i}", "en") for i in range(10)],
        "doc_id long, text string, lang string")
    dp = str(tmp_path / "docs")
    docs.write.parquet(dp)
    svc = SearchService(spark, str(tmp_path / "ix"))
    svc.create_index("r", dp, fields={"text": "text"})
    svc.snapshot("r")

    stop = threading.Event()
    errors: list = []
    observations = {"n": 0}

    def hammer():
        while not stop.is_set():
            try:
                res = svc.search("r", {"query": {"match_all": {}},
                                       "size": 1})
                if res["total"] != 10:
                    errors.append(f"total flickered to {res['total']}")
                    return
                got = svc.search("r", {"query": {"term": {
                    "field": "text", "value": "u3tok"}}, "size": 3})
                if got["total"] > 1:
                    errors.append(f"doc 3 duplicated ({got['total']})")
                    return
                observations["n"] += 1
            except Exception as e:  # noqa: BLE001 — report, don't hang
                errors.append(repr(e))
                return

    t = threading.Thread(target=hammer, daemon=True)
    t.start()
    try:
        # three upsert+flush cycles on doc 3 while the hammer runs; each
        # flush folds, resolves, promotes — every window the sweep found
        for gen in range(1, 4):
            svc.add_documents("r", [{
                "doc_id": 3,
                "text": f"alpha shared u3tok gen{gen}", "lang": "en"}])
            svc.flush("r")
    finally:
        stop.set()
        t.join(timeout=30)
    assert not errors, errors
    assert observations["n"] >= 3, "hammer observed too little to matter"
    res = svc.search("r", {"query": {"term": {
        "field": "text", "value": "gen3"}}, "size": 3})
    assert res["total"] == 1 and res["hits"][0]["doc_id"] == 3
