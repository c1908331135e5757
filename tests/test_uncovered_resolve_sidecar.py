"""Regression: sidecar refresh over an UNCOVERED resolved run.

A doc upserted and flushed BEFORE any snapshot covered its runs leaves
the superseded generation only in the runs' raw docs batches. The flush
resolves the tombstone (and purges whatever sidecar rows exist THEN),
but the next refresh_doc_values installs those raw batches as deltas —
old generation included — with no barrier left to mask it: enrichment
then served the stale body and aggregations could double-count (found
by tools/soak_lifecycle.py seed 2 under crash injection, reproducible
with no crash at all). compact_runs now records the purged
(doc_id -> barrier) pairs on its resolve event and refresh_doc_values
re-applies them after installing deltas."""

from __future__ import annotations

import glob
import json
import os

from search_engine_spark.server import SearchService


def _mk(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha shared body{i}", "en") for i in range(5)],
        "doc_id long, text string, lang string")
    dp = str(tmp_path / "docs")
    docs.write.parquet(dp)
    svc = SearchService(spark, str(tmp_path / "ix"))
    svc.create_index("c", dp, fields={"text": "text"})
    svc.snapshot("c")
    return svc


def test_uncovered_resolved_run_purged_from_sidecar(spark, tmp_path):
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("c")
    svc.add_documents("c", [{"doc_id": 100,
                             "text": "alpha shared genzero", "lang": "en"}])
    svc.add_documents("c", [{"doc_id": 100,
                             "text": "alpha shared genone", "lang": "en"}])
    svc.flush("c")      # resolves the upsert; runs were never snapshotted
    svc.snapshot("c")   # installs the raw run deltas, then re-purges

    res = svc.search("c", {"query": {"term": {
        "field": "text", "value": "genone"}}, "size": 5})
    assert res["total"] == 1
    assert res["hits"][0]["text"] == "alpha shared genone"

    # the old generation's row is PHYSICALLY gone from the sidecar
    import duckdb
    rows = duckdb.sql(
        "select text from read_parquet('" +
        os.path.join(ixdir, "doc_values") + "/*.parquet', "
        "hive_partitioning=0) where doc_id = 100").fetchall()
    assert [r[0] for r in rows] == ["alpha shared genone"], rows

    # dv meta carries the consumed resolution lineage
    with open(os.path.join(ixdir, "doc_values_meta.json")) as fh:
        dvm = json.load(fh)
    with open(os.path.join(ixdir, "meta.json")) as fh:
        m = json.load(fh)
    assert dvm["resolve_epoch"] == m["resolve_epoch"] >= 1


def test_resolve_events_pruned_once_consumed(spark, tmp_path):
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("c")
    for gen in ("one", "two"):
        svc.add_documents("c", [{"doc_id": 100,
                                 "text": f"alpha shared gen{gen}",
                                 "lang": "en"}])
        svc.flush("c")
        svc.snapshot("c")
    # one more flush prunes events both snapshot artifacts consumed
    svc.add_documents("c", [{"doc_id": 101,
                             "text": "alpha shared other", "lang": "en"}])
    svc.flush("c")
    with open(os.path.join(ixdir, "meta.json")) as fh:
        m = json.load(fh)
    kept = m.get("resolve_events", [])
    assert all(int(ev["epoch"]) > 0 for ev in kept)
    assert len(kept) <= 1, kept  # only the not-yet-consumed tail survives


def test_legacy_event_without_purges_forces_rebuild(spark, tmp_path):
    from search_engine_spark.operators.doc_values import (
        load_doc_values_meta, refresh_doc_values)
    from search_engine_spark.operators.index_build import write_meta
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("c")
    with open(os.path.join(ixdir, "meta.json")) as fh:
        m = json.load(fh)
    m["resolve_epoch"] = int(m.get("resolve_epoch", 0)) + 1
    m["resolve_events"] = list(m.get("resolve_events", [])) + [
        {"epoch": m["resolve_epoch"], "buckets": []}]  # pre-upgrade shape
    write_meta(ixdir, m)
    out = refresh_doc_values(spark, ixdir,
                             full_docs=svc._docs_view("c"))
    assert out is not None
    assert out["resolve_epoch"] == m["resolve_epoch"]
    dvm = load_doc_values_meta(ixdir)
    assert dvm["resolve_epoch"] == m["resolve_epoch"]
