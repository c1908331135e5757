"""Pending-activation tombstones: upsert replacement is atomic.

An upsert used to tombstone the old generation and then spend ~a second
writing the new run — every path showed the doc MISSING in between (and
a crash there lost it until re-add). The tombstone now names the
reserved run and masks nothing until that run's manifest commit; the
run entry carries the replaced docs' (count, dl) so reconcile_meta
applies the net stats delta in the same atomic step."""

from __future__ import annotations

import json
import os

import duckdb

from search_engine_spark.server import SearchService


def _mk(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha shared body{i}", "en") for i in range(6)],
        "doc_id long, text string, lang string")
    dp = str(tmp_path / "docs")
    docs.write.parquet(dp)
    svc = SearchService(spark, str(tmp_path / "ix"))
    svc.create_index("p", dp, fields={"text": "text"})
    svc.snapshot("p")
    return svc


def test_crashed_upsert_leaves_old_generation_live(spark, tmp_path,
                                                   monkeypatch):
    from search_engine_spark.operators import lsm
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("p")

    class Boom(Exception):
        pass

    # crash AFTER the pending tombstone is written, BEFORE any run data:
    # write_run is the first thing the append does past the reservation
    orig = lsm.write_run

    def crashing(*a, **kw):
        raise Boom()

    monkeypatch.setattr(lsm, "write_run", crashing)
    try:
        svc.add_documents("p", [{"doc_id": 2,
                                 "text": "alpha shared newbody",
                                 "lang": "en"}])
        raise AssertionError("expected the injected crash")
    except Boom:
        pass
    monkeypatch.setattr(lsm, "write_run", orig)
    # the inert tombstone exists on disk but masks nothing
    tf = os.path.join(ixdir, "tombstones.parquet")
    rows = duckdb.sql(f"select * from read_parquet('{tf}')").fetchall()
    assert any(r[0] == 2 and r[2] is not None for r in rows), rows

    svc2 = SearchService(spark, str(tmp_path / "ix"))  # restart
    res = svc2.search("p", {"query": {"term": {
        "field": "text", "value": "body2"}}, "size": 5})
    assert res["total"] == 1 and res["hits"][0]["doc_id"] == 2
    res = svc2.search("p", {"query": {"match_all": {}}, "size": 1})
    assert res["total"] == 6
    with open(os.path.join(ixdir, "meta.json")) as fh:
        assert json.load(fh)["total_docs"] == 6

    # retrying the upsert succeeds and sweeps the inert row
    out = svc2.add_documents("p", [{"doc_id": 2,
                                    "text": "alpha shared newbody",
                                    "lang": "en"}])
    assert out["replacedCount"] == 1
    res = svc2.search("p", {"query": {"term": {
        "field": "text", "value": "newbody"}}, "size": 5})
    assert res["total"] == 1
    res = svc2.search("p", {"query": {"term": {
        "field": "text", "value": "body2"}}, "size": 5})
    assert res["total"] == 0
    svc2.flush("p")
    rows = duckdb.sql(f"select * from read_parquet('{tf}')").fetchall() \
        if os.path.isfile(tf) else []
    assert not any(r[2] is not None for r in rows), rows


def test_upsert_stats_delta_is_atomic(spark, tmp_path):
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("p")
    # replace a 3-token doc with a 6-token doc: dl_sum moves by +3 in ONE
    # manifest commit (no intermediate N-1 state on disk)
    svc.add_documents("p", [{"doc_id": 3,
                             "text": "alpha shared body3 plus two more",
                             "lang": "en"}])
    with open(os.path.join(ixdir, "meta.json")) as fh:
        m = json.load(fh)
    assert m["total_docs"] == 6
    assert m["dl_sum"] == 6 * 3 + 3
    res = svc.search("p", {"query": {"match_all": {}}, "size": 1})
    assert res["total"] == 6

def test_crashed_second_upsert_keeps_first_generation(spark, tmp_path,
                                                      monkeypatch):
    """ADVICE r4 (high): the pending row of a SECOND upsert must not evict
    the ACTIVE tombstone the first upsert left behind — a crash before the
    second run commits would otherwise resurrect the replaced gen-0 body
    (match_all 7, 'body2' searchable again)."""
    from search_engine_spark.operators import lsm
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("p")

    out = svc.add_documents("p", [{"doc_id": 2,
                                   "text": "alpha shared newbody",
                                   "lang": "en"}])
    assert out["replacedCount"] == 1  # commits: active tombstone barrier 0

    class Boom(Exception):
        pass

    orig = lsm.write_run

    def crashing(*a, **kw):
        raise Boom()

    monkeypatch.setattr(lsm, "write_run", crashing)
    try:
        svc.add_documents("p", [{"doc_id": 2,
                                 "text": "alpha shared thirdbody",
                                 "lang": "en"}])
        raise AssertionError("expected the injected crash")
    except Boom:
        pass
    monkeypatch.setattr(lsm, "write_run", orig)

    # the file must carry BOTH rows for doc 2: the active barrier-0 mask
    # and the inert pending row of the crashed upsert
    import duckdb as dd
    tf = os.path.join(ixdir, "tombstones.parquet")
    rows = dd.sql(f"select * from read_parquet('{tf}') "
                  "where doc_id = 2").fetchall()
    assert any(r[2] is None for r in rows), rows       # active survived
    assert any(r[2] is not None for r in rows), rows   # pending inert

    svc2 = SearchService(spark, str(tmp_path / "ix"))  # restart
    res = svc2.search("p", {"query": {"match_all": {}}, "size": 1})
    assert res["total"] == 6  # NOT 7 — gen 0 stays masked
    res = svc2.search("p", {"query": {"term": {
        "field": "text", "value": "body2"}}, "size": 5})
    assert res["total"] == 0  # replaced gen-0 body stays dead
    res = svc2.search("p", {"query": {"term": {
        "field": "text", "value": "newbody"}}, "size": 5})
    assert res["total"] == 1 and res["hits"][0]["doc_id"] == 2

    # retrying the second upsert completes the replacement
    out = svc2.add_documents("p", [{"doc_id": 2,
                                    "text": "alpha shared thirdbody",
                                    "lang": "en"}])
    assert out["replacedCount"] == 1
    res = svc2.search("p", {"query": {"term": {
        "field": "text", "value": "thirdbody"}}, "size": 5})
    assert res["total"] == 1
    res = svc2.search("p", {"query": {"match_all": {}}, "size": 1})
    assert res["total"] == 6


def test_streaming_upsert_crash_keeps_prior_generation(spark, tmp_path,
                                                       monkeypatch):
    """Same hole via the streaming ingest path: batch-2 upsert of an id
    already replaced by batch-1 crashes before write_run — the batch-1
    generation must stay live after restart."""
    from search_engine_spark.operators import lsm
    from search_engine_spark.operators.delete import delete_docs
    from search_engine_spark.operators.lsm import live_doc_dl, write_run
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("p")
    out = svc.add_documents("p", [{"doc_id": 2,
                                   "text": "alpha shared newbody",
                                   "lang": "en"}])
    assert out["replacedCount"] == 1
    # emulate the streaming foreachBatch collision path directly (the
    # operators it calls are exactly what process_batch calls)
    replaced_dl = live_doc_dl(spark, ixdir, [2])
    assert replaced_dl > 0
    delete_docs(spark, ixdir, [2], pending_run="stream_batch=99")
    # crash: write_run never happens. Restart and query.
    svc2 = SearchService(spark, str(tmp_path / "ix"))
    res = svc2.search("p", {"query": {"match_all": {}}, "size": 1})
    assert res["total"] == 6
    res = svc2.search("p", {"query": {"term": {
        "field": "text", "value": "body2"}}, "size": 5})
    assert res["total"] == 0
    res = svc2.search("p", {"query": {"term": {
        "field": "text", "value": "newbody"}}, "size": 5})
    assert res["total"] == 1
