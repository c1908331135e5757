"""Service restart restores the document store from disk.

create_index records the docs table's location in meta.json
(``docs_path``); a FRESH SearchService over the same catalog root
re-registers it lazily, so searches, appends, enrichment, and
aggregations work with no operator --register step — the reference's
snapshot restore brings documents back by itself."""

from __future__ import annotations

from search_engine_spark.server import SearchService


def _mk(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha shared body{i}", "en") for i in range(10)],
        "doc_id long, text string, lang string")
    dp = str(tmp_path / "docs")
    docs.write.parquet(dp)
    svc = SearchService(spark, str(tmp_path / "ix"))
    svc.create_index("r", dp, fields={"text": "text"})
    svc.snapshot("r")
    return svc


def test_restart_serves_without_register(spark, tmp_path):
    _mk(spark, tmp_path)
    svc2 = SearchService(spark, str(tmp_path / "ix"))
    res = svc2.search("r", {"query": {"term": {
        "field": "text", "value": "body3"}}, "size": 5})
    assert res["total"] == 1 and res["hits"][0]["doc_id"] == 3
    assert res["hits"][0]["text"] == "alpha shared body3"


def test_restart_append_then_search(spark, tmp_path):
    _mk(spark, tmp_path)
    svc2 = SearchService(spark, str(tmp_path / "ix"))
    out = svc2.add_documents("r", [{"doc_id": 50,
                                    "text": "alpha shared fresh",
                                    "lang": "en"}])
    assert out["addedCount"] == 1
    res = svc2.search("r", {"query": {"term": {
        "field": "text", "value": "fresh"}}, "size": 5})
    assert res["total"] == 1 and res["hits"][0]["doc_id"] == 50
    agg = svc2.search("r", {"query": {"match_all": {}}, "size": 0,
                            "aggregations": {"langs": {"terms": {
                                "field": "lang"}}}})
    assert agg["total"] == 11
    assert agg["aggregations"]["langs"]["buckets"][0]["doc_count"] == 11


def test_restart_without_recorded_path_still_errors(spark, tmp_path):
    import json
    import os

    import pytest

    from search_engine_spark.operators.index_build import write_meta
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("r")
    with open(os.path.join(ixdir, "meta.json")) as fh:
        m = json.load(fh)
    m.pop("docs_path", None)
    write_meta(ixdir, m)
    svc2 = SearchService(spark, str(tmp_path / "ix"))
    with pytest.raises(RuntimeError, match="no docs table"):
        svc2.search("r", {"query": {"match_all": {}}, "size": 1})
