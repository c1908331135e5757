"""Live-document upsert (replace-on-add).

The reference's ``add()`` REPLACES a live document when its id already
exists (QueryEngine.ts:137-149: ``repository.save`` returns ``replaced``,
the indexer removes the old postings, then re-indexes the new doc) — and
the HTTP facade reaches it per-doc (SearchWorker.ts:214-227), so a POST of
a changed document must supersede the stored version. ``lsm.upsert_docs``
is the LSM twin: identical re-sends are dropped (idempotent retry, the
CRDT duplicate-operation analog), changed docs go tombstone → physical
purge → fresh run, composed entirely from the tested delete/revival path.
"""

import math
import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.delete import load_index_with_deletes
from search_engine_spark.operators.index_build import (IndexConfig,
                                                       write_index)
from search_engine_spark.operators.lsm import (identical_ids, live_runs,
                                               upsert_docs)
from search_engine_spark.plans.dsl import SparkSearchEngine
from search_engine_spark.server import SearchService

CFG = IndexConfig(id_col="doc_id", fields={"text": "text"}, n_buckets=4)


def _corpus(spark, n=24):
    return spark.createDataFrame(
        [(i, f"alpha base{i} tok{i % 5} shared", "en") for i in range(n)],
        "doc_id long, text string, lang string")


@pytest.fixture()
def ix(tmp_path, spark):
    d = str(tmp_path / "ix")
    write_index(_corpus(spark), d, CFG)
    return d


def _members(spark, ixdir, term):
    eng = SparkSearchEngine(load_index_with_deletes(spark, ixdir),
                            _corpus(spark))
    return sorted(r["doc_id"] for r in eng.search(
        {"term": {"field": "text", "value": term}}, size=100).collect())


# ---------------------------------------------------------------- operator

def test_changed_doc_is_replaced(spark, ix):
    docs = _corpus(spark)
    batch = spark.createDataFrame(
        [(3, "alpha swapped payload", "en")], docs.schema)
    res = upsert_docs(batch, ix, CFG, current=docs)
    assert (res["added"], res["replaced"], res["unchanged"]) == (0, 1, 0)
    # old postings are gone, new ones live
    assert _members(spark, ix, "base3") == []
    assert _members(spark, ix, "swapped") == [3]
    # membership elsewhere untouched, total corpus size unchanged
    assert _members(spark, ix, "shared") == [i for i in range(24) if i != 3]
    idx = load_index_with_deletes(spark, ix)
    assert idx.doc_stats.count() == 24


def test_identical_resend_is_free(spark, ix):
    docs = _corpus(spark)
    before = live_runs(ix)
    res = upsert_docs(docs.where(F.col("doc_id") < 5), ix, CFG,
                      current=docs)
    assert (res["added"], res["replaced"], res["unchanged"]) == (0, 0, 5)
    assert res["entry"] is None
    assert live_runs(ix) == before  # no run written
    assert not os.path.isdir(os.path.join(ix, "tombstones"))


def test_mixed_batch_counts(spark, ix):
    docs = _corpus(spark)
    batch = spark.createDataFrame(
        [(100, "alpha brand new", "en"),          # fresh id
         (4, "alpha base4 tok4 shared", "en"),    # identical re-send
         (5, "alpha rewritten five", "de")],      # changed
        docs.schema)
    res = upsert_docs(batch, ix, CFG, current=docs)
    assert (res["added"], res["replaced"], res["unchanged"]) == (1, 1, 1)
    assert _members(spark, ix, "brand") == [100]
    assert _members(spark, ix, "rewritten") == [5]
    assert _members(spark, ix, "base5") == []
    assert _members(spark, ix, "base4") == [4]
    assert load_index_with_deletes(spark, ix).doc_stats.count() == 25


def test_without_current_every_collision_replaces(spark, ix):
    docs = _corpus(spark)
    res = upsert_docs(docs.where(F.col("doc_id") == 7), ix, CFG)
    assert (res["added"], res["replaced"], res["unchanged"]) == (0, 1, 0)
    # identical content re-indexed: same members as before, one copy
    assert _members(spark, ix, "base7") == [7]
    assert load_index_with_deletes(spark, ix).doc_stats.count() == 24


def test_stats_match_fresh_build_after_upsert(spark, tmp_path, ix):
    """BM25 over the upserted index ranks and scores like an index built
    fresh over the final corpus — N, dl_sum, avg_dl, df all exact after
    the tombstone→purge→append cycle."""
    docs = _corpus(spark)
    newdocs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 2,
               F.concat(F.lit("upserted entry number "),
                        F.col("doc_id").cast("string")))
        .otherwise(F.col("text")))
    batch = newdocs.where(F.col("doc_id") % 7 == 2)
    upsert_docs(batch, ix, CFG, current=docs)

    fresh_dir = str(tmp_path / "fresh")
    write_index(newdocs, fresh_dir, CFG)
    q = {"match": {"field": "text", "value": "shared alpha"}}
    got = [(r["doc_id"], r["score"]) for r in SparkSearchEngine(
        load_index_with_deletes(spark, ix), newdocs).search(
            q, size=30).collect()]
    want = [(r["doc_id"], r["score"]) for r in SparkSearchEngine(
        load_index_with_deletes(spark, fresh_dir), newdocs).search(
            q, size=30).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12), gd


def test_upsert_of_run_resident_doc(spark, ix):
    """Replacing a doc that lives in an UNCOMPACTED run (not the base)
    works too — delete_docs/compact_deletes are LSM-aware."""
    docs = _corpus(spark)
    from search_engine_spark.operators.lsm import append_docs
    append_docs(spark.createDataFrame(
        [(200, "alpha transient run doc", "en")], docs.schema), ix, CFG)
    res = upsert_docs(spark.createDataFrame(
        [(200, "alpha persistent version", "en")], docs.schema), ix, CFG,
        current=docs)  # 200 absent from `current` -> treated changed
    assert res["replaced"] == 1
    assert _members(spark, ix, "transient") == []
    assert _members(spark, ix, "persistent") == [200]


# ----------------------------------------------------------- identical_ids

def _iids(batch, cur):
    return sorted(r["doc_id"] for r in
                  identical_ids(batch, cur, "doc_id").collect())


def test_identical_ids_column_rules(spark):
    cur = spark.createDataFrame(
        [(1, "a", 1.0, ["x", "y"]), (2, "b", float("nan"), []),
         (3, "c", None, None)],
        "doc_id long, t string, v double, arr array<string>")
    same = spark.createDataFrame(
        [(1, "a", 1.0, ["x", "y"]), (2, "b", float("nan"), []),
         (3, "c", None, None)], cur.schema)
    assert _iids(same, cur) == [1, 2, 3]  # NaN<=>NaN and null<=>null hold
    # any column drift -> changed
    drift = spark.createDataFrame(
        [(1, "a", 1.0, ["x", "Z"]), (2, "B", float("nan"), []),
         (3, "c", 0.0, None)], cur.schema)
    assert _iids(drift, cur) == []


def test_identical_ids_missing_and_extra_columns(spark):
    cur = spark.createDataFrame([(1, "a", "en"), (2, "b", None)],
                                "doc_id long, t string, lang string")
    # batch lacks `lang`: identical only where stored lang is null
    b = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, t string")
    assert _iids(b, cur) == [2]
    # batch has an EXTRA non-null column: changed
    b2 = spark.createDataFrame([(2, "b", 9)],
                               "doc_id long, t string, extra int")
    assert _iids(b2, cur) == []


def test_identical_ids_type_coercion_and_maps(spark):
    cur = spark.createDataFrame([(1, 5), (2, 6)], "doc_id long, v long")
    b = spark.createDataFrame([(1, 5), (2, 7)], "doc_id long, v int")
    assert _iids(b, cur) == [1]  # int 5 try_casts to long 5
    mcur = spark.createDataFrame([(1, {"k": "v"})],
                                 "doc_id long, m map<string,string>")
    assert _iids(mcur, mcur) == []  # maps always conservative-changed


def test_non_numeric_ids_rejected_on_replace_path(spark, tmp_path):
    d = str(tmp_path / "strix")
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"}, n_buckets=2)
    docs = spark.createDataFrame([("a1", "alpha one"), ("b2", "alpha two")],
                                 "doc_id string, text string")
    write_index(docs, d, cfg)
    with pytest.raises(ValueError, match="long-castable"):
        upsert_docs(spark.createDataFrame([("a1", "alpha changed")],
                                          docs.schema), d, cfg,
                    current=docs)


# ------------------------------------------------------------------ server

@pytest.fixture()
def svc(tmp_path, spark):
    src = str(tmp_path / "src")
    _corpus(spark).write.parquet(src)
    s = SearchService(spark, str(tmp_path))
    s.create_index("u", src, fields={"text": "text"})
    s.snapshot("u")
    return s


def _hits(res):
    return sorted(h["doc_id"] for h in res["hits"])


def test_server_post_replaces_changed_live_doc(spark, svc):
    r = svc.add_documents("u", [
        {"doc_id": 3, "text": "alpha overhauled three", "lang": "fr"},
        {"doc_id": 4, "text": "alpha base4 tok4 shared", "lang": "en"}])
    assert r["addedCount"] == 1 and r["replacedCount"] == 1
    assert r["duplicateCount"] == 1
    svc.snapshot("u")

    res = svc.search("u", {"query": {"term": {"field": "text",
                                              "value": "overhauled"}},
                           "size": 5})
    assert _hits(res) == [3]
    # new stored values reach enrichment + aggregations
    assert res["hits"][0]["lang"] == "fr"
    assert _hits(svc.search("u", {"query": {"term": {
        "field": "text", "value": "base3"}}, "size": 5})) == []
    assert svc.search("u", {"query": {"match_all": {}},
                            "size": 1})["total"] == 24
    agg = svc.search("u", {"query": {"match_all": {}}, "size": 0,
                           "aggregations": {"langs": {"terms": {
                               "field": "lang", "size": 5}}}})
    counts = {b["key"]: b["doc_count"]
              for b in agg["aggregations"]["langs"]["buckets"]}
    assert counts == {"en": 23, "fr": 1}


def test_server_identical_resend_stays_cheap_duplicate(spark, svc):
    ixdir = svc.catalog._dir("u")
    before = live_runs(ixdir)
    r = svc.add_documents("u", [{"doc_id": 5,
                                 "text": "alpha base5 tok0 shared",
                                 "lang": "en"}])
    assert r["addedCount"] == 0 and r["replacedCount"] == 0
    assert r["duplicateCount"] == 1
    assert live_runs(ixdir) == before
    assert not os.path.isdir(os.path.join(ixdir, "tombstones"))


def test_server_second_upsert_generation_wins(spark, svc):
    svc.add_documents("u", [{"doc_id": 8, "text": "alpha version two",
                             "lang": "en"}])
    svc.add_documents("u", [{"doc_id": 8, "text": "alpha version three",
                             "lang": "en"}])
    svc.snapshot("u")
    res = svc.search("u", {"query": {"term": {"field": "text",
                                              "value": "version"}},
                           "size": 5})
    assert _hits(res) == [8]
    assert res["hits"][0]["text"] == "alpha version three"
    assert _hits(svc.search("u", {"query": {"term": {
        "field": "text", "value": "two"}}, "size": 5})) == []
    assert svc.search("u", {"query": {"match_all": {}},
                            "size": 1})["total"] == 24
