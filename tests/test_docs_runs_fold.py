"""docs_runs chunk folding (consolidate_docs_runs).

Every HTTP append leaves one docs-run chunk; without folding the
document-store union view's plan grows one frame per append and delete
compaction pays one Spark job per chunk. Covered chunks fold into one
latest-generation `folded=<M>` chunk whose name keeps the reader's
(number, name) order correct at every intermediate state."""

from __future__ import annotations

import os

from search_engine_spark.operators.lsm import consolidate_docs_runs
from search_engine_spark.server import SearchService


def _mk(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha shared body{i}", "en") for i in range(4)],
        "doc_id long, text string, lang string")
    dp = str(tmp_path / "docs")
    docs.write.parquet(dp)
    svc = SearchService(spark, str(tmp_path / "ix"))
    svc.create_index("f", dp, fields={"text": "text"})
    svc.snapshot("f")
    return svc


def test_fold_covered_chunks_latest_generation_wins(spark, tmp_path):
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("f")
    # 3 appends incl. an upsert chain on doc 50; snapshot covers them
    svc.add_documents("f", [{"doc_id": 50, "text": "alpha shared genzero",
                             "lang": "en"}])
    svc.add_documents("f", [{"doc_id": 50, "text": "alpha shared genone",
                             "lang": "en"},
                            {"doc_id": 51, "text": "alpha shared other",
                             "lang": "en"}])
    svc.snapshot("f")
    dr = os.path.join(ixdir, "docs_runs")
    before = sorted(os.listdir(dr))
    assert len(before) >= 2
    out = consolidate_docs_runs(spark, ixdir, min_chunks=2)
    assert out["folded_chunks"] >= 2
    after = sorted(c for c in os.listdir(dr)
                   if os.path.isdir(os.path.join(dr, c)))
    assert after == [out["chunk"]] and after[0].startswith("folded=")

    # the view still resolves doc 50 to its LATEST generation
    res = svc.search("f", {"query": {"term": {
        "field": "text", "value": "genone"}}, "size": 5})
    assert res["total"] == 1 and res["hits"][0]["text"] \
        == "alpha shared genone"
    res = svc.search("f", {"query": {"match_all": {}}, "size": 1})
    assert res["total"] == 6

    # a LATER append must sort after the folded chunk and win on upsert
    svc.add_documents("f", [{"doc_id": 50, "text": "alpha shared gentwo",
                             "lang": "en"}])
    res = svc.search("f", {"query": {"term": {
        "field": "text", "value": "gentwo"}}, "size": 5})
    assert res["total"] == 1 and res["hits"][0]["text"] \
        == "alpha shared gentwo"
    res = svc.search("f", {"query": {"term": {
        "field": "text", "value": "genone"}}, "size": 5})
    assert res["total"] == 0


def test_uncovered_chunks_stay(spark, tmp_path):
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("f")
    svc.add_documents("f", [{"doc_id": 50, "text": "alpha shared a",
                             "lang": "en"}])
    svc.snapshot("f")
    # second append NOT covered by any snapshot: must not fold (the
    # incremental sidecar refresh still needs its per-run batch)
    svc.add_documents("f", [{"doc_id": 51, "text": "alpha shared b",
                             "lang": "en"}])
    out = consolidate_docs_runs(spark, ixdir, min_chunks=2)
    assert out["folded_chunks"] == 0
    # after covering it, folding proceeds
    svc.snapshot("f")
    out = consolidate_docs_runs(spark, ixdir, min_chunks=2)
    assert out["folded_chunks"] == 2
    res = svc.search("f", {"query": {"match_all": {}}, "size": 1})
    assert res["total"] == 6


def test_snapshot_triggers_fold_past_threshold(spark, tmp_path):
    svc = _mk(spark, tmp_path)
    svc.auto_persist["consolidate_after"] = 2
    ixdir = svc.catalog._dir("f")
    for i in (50, 51):
        svc.add_documents("f", [{"doc_id": i,
                                 "text": f"alpha shared tok{i}",
                                 "lang": "en"}])
    svc.snapshot("f")  # covers the 2 chunks
    out = svc.snapshot("f")  # second pass folds them (now eligible)
    dr = os.path.join(ixdir, "docs_runs")
    chunks = sorted(c for c in os.listdir(dr)
                    if os.path.isdir(os.path.join(dr, c)))
    assert any(c.startswith("folded=") for c in chunks), (chunks, out)
    res = svc.search("f", {"query": {"match_all": {}}, "size": 1})
    assert res["total"] == 6
