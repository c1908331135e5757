"""Crash-replay exactness of upsert resolution (compact_runs).

Two windows found by the crash-injection soak (tools/soak_lifecycle.py):

1. Crash AFTER the base-bucket overwrite, before the resolution event is
   recorded: the replay re-derives the extension buckets from the
   already-purged base and under-records the event, so the block
   snapshot never rebuilds the missed partitions — the superseded rows
   resurface once the tombstone is gone (seed 1).  Fixed by the
   ``resolve_journal.json`` written before the overwrite.

2. Crash AFTER the tombstone shrink, before mark_compacted: the replay
   folds the still-live runs with no barriers left, resurrecting
   superseded generations into the base and double-promoting their
   doc_stats rows.  Fixed by the tombstone-independent per-doc max-seq
   rules and the early meta write that makes the event durable before
   the shrink."""

from __future__ import annotations

import json
import os

import pytest

from search_engine_spark.operators import lsm
from search_engine_spark.operators.delete import load_index_with_deletes
from search_engine_spark.server import SearchService
from search_engine_spark.serving import ServingIndex


class Boom(Exception):
    pass


def _mk(spark, tmp_path, extra_doc_text="alpha shared oldvocab"):
    docs = spark.createDataFrame(
        [(0, extra_doc_text, "en"),
         (1, "alpha shared filler", "en")],
        "doc_id long, text string, lang string")
    dp = str(tmp_path / "docs")
    docs.write.parquet(dp)
    svc = SearchService(spark, str(tmp_path / "ix"))
    svc.create_index("r", dp, fields={"text": "text"})
    svc.snapshot("r")
    return svc


def test_crash_after_base_overwrite_event_still_covers_old_vocab(
        spark, tmp_path, monkeypatch):
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("r")
    # upsert doc 0: oldvocab -> newvocab; old vocabulary lives in BASE
    svc.add_documents("r", [{"doc_id": 0,
                             "text": "alpha shared newvocab",
                             "lang": "en"}])
    orig = lsm._purge_parquet_dir
    calls = {"n": 0}

    def crashing(*a, **kw):
        calls["n"] += 1
        raise Boom("injected after base overwrite")

    # _purge_parquet_dir is the first resolution step after the base
    # overwrite committed — crashing here models window 1 exactly
    monkeypatch.setattr(lsm, "_purge_parquet_dir", crashing)
    with pytest.raises(Boom):
        svc.flush("r")
    assert calls["n"] == 1
    assert os.path.isfile(os.path.join(ixdir, "resolve_journal.json"))
    monkeypatch.setattr(lsm, "_purge_parquet_dir", orig)
    svc = SearchService(spark, str(tmp_path / "ix"))  # process restart
    svc.flush("r")  # replay
    assert not os.path.isfile(os.path.join(ixdir, "resolve_journal.json"))
    svc.snapshot("r")

    # the resolution event must cover oldvocab's bucket even though the
    # replay could no longer see it in the base
    with open(os.path.join(ixdir, "meta.json")) as fh:
        m = json.load(fh)
    from search_engine_spark.operators.index_build import bucket_of
    b_old = bucket_of("text", "oldvocab", m["n_buckets"])
    assert any(b_old in ev.get("buckets", [])
               for ev in m.get("resolve_events", [])) or not \
        m.get("resolve_events"), m.get("resolve_events")

    for q, want in (("oldvocab", 0), ("newvocab", 1)):
        res = svc.search("r", {"query": {"term": {
            "field": "text", "value": q}}, "size": 5})
        assert res["total"] == want, (q, res)
    srv = ServingIndex(ixdir)
    _, tot = srv.search_with_total({"term": {"field": "text",
                                             "value": "oldvocab"}}, k=5)
    assert tot == 0, "stale block segment resurfaced"
    _, tot = srv.search_with_total({"match_all": {}}, k=5)
    assert tot == 2


def test_crash_after_tombstone_shrink_replay_no_resurrection(
        spark, tmp_path, monkeypatch):
    svc = _mk(spark, tmp_path)
    ixdir = svc.catalog._dir("r")
    # two upserts before any flush: genone is a superseded RUN generation
    svc.add_documents("r", [{"doc_id": 0,
                             "text": "alpha shared genone", "lang": "en"}])
    svc.add_documents("r", [{"doc_id": 0,
                             "text": "alpha shared gentwo", "lang": "en"}])

    orig_mark = lsm.mark_compacted

    def crashing_mark(*a, **kw):
        raise Boom("injected after tombstone shrink")

    monkeypatch.setattr(lsm, "mark_compacted", crashing_mark)
    with pytest.raises(Boom):
        svc.flush("r")
    # the shrink committed: no barrier tombstones left
    assert not os.path.isfile(os.path.join(ixdir, "tombstones.parquet"))
    monkeypatch.setattr(lsm, "mark_compacted", orig_mark)
    svc = SearchService(spark, str(tmp_path / "ix"))
    svc.flush("r")  # replay with no barriers
    svc.snapshot("r")

    for q, want in (("oldvocab", 0), ("genone", 0), ("gentwo", 1)):
        res = svc.search("r", {"query": {"term": {
            "field": "text", "value": q}}, "size": 5})
        assert res["total"] == want, (q, res)
    # doc_stats exactness: one row per live doc, no double promotion
    idx = load_index_with_deletes(spark, ixdir)
    assert idx.doc_stats.count() == 2
    assert idx.doc_stats.select("doc_id").distinct().count() == 2
    res = svc.search("r", {"query": {"match_all": {}}, "size": 1})
    assert res["total"] == 2
