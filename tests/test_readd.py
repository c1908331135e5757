"""Delete -> re-add lifecycle (upsert revival).

The reference's in-process ``add()`` is an upsert (QueryEngine.ts:137-149:
``repository.save`` replaces the stored doc, removeDocument drops the old
postings, then the new doc is re-indexed) — so a deleted id must come back
to life when re-added. Our LSM + merge-on-read design has three states a
re-added id can be in, each with its own path:

- still TOMBSTONED (deleted, not compacted): nothing special happens —
  the new run's generation ``seq`` exceeds the tombstone's barrier, so
  every reader's sequence-numbered mask (rows with seq <= barrier hidden)
  shows the new generation and hides the old. O(batch), no rewrite; the
  physical purge defers to the next compaction (tests/test_barriers.py).
- physically PURGED (compact_deletes ran): its registered docs-table row
  is masked via the ``docs_tombstones`` table; re-add just unmasks it and
  the docs-run row becomes the value source — O(batch).
- LIVE + identical content: duplicate (idempotent retry, dropped).
- LIVE + changed content: REPLACED via lsm.upsert_docs (tombstone →
  purge → fresh run) — see tests/test_upsert.py.
"""

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.delete import (compact_deletes,
                                                  delete_docs,
                                                  docs_tombstones_path,
                                                  load_docs_tombstones,
                                                  load_index_with_deletes)
from search_engine_spark.plans.dsl import SparkSearchEngine
from search_engine_spark.server import SearchService


@pytest.fixture()
def svc(tmp_path, spark):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"alpha old{i} tok{i % 5}", "en") for i in range(30)],
        "doc_id long, text string, lang string").write.parquet(src)
    s = SearchService(spark, str(tmp_path))
    s.create_index("w", src, fields={"text": "text"})
    s.snapshot("w")
    return s


def _ids(res):
    return sorted(h["doc_id"] for h in res["hits"])


def test_readd_before_compaction_revives(spark, svc):
    ix = svc.catalog._dir("w")
    delete_docs(spark, ix, [5])
    r = svc.add_documents("w", [{"doc_id": 5, "text": "alpha reborn five",
                                 "lang": "en"}])
    assert r["addedCount"] == 1 and r["duplicateCount"] == 0
    svc.snapshot("w")

    res = svc.search("w", {"query": {"term": {"field": "text",
                                              "value": "reborn"}},
                           "size": 5})
    assert _ids(res) == [5]
    # the old generation is barrier-masked (no physical purge happened)
    old = svc.search("w", {"query": {"term": {"field": "text",
                                              "value": "old5"}}, "size": 5})
    assert _ids(old) == []
    assert svc.search("w", {"query": {"match_all": {}},
                            "size": 1})["total"] == 30
    # stored-document enrichment serves the NEW values
    assert res["hits"][0]["text"] == "alpha reborn five"


def test_compaction_does_not_resurrect_docs_table_queries(spark, svc):
    ix = svc.catalog._dir("w")
    delete_docs(spark, ix, [7])
    compact_deletes(spark, ix)
    svc.snapshot("w")

    # serving fast path
    res = svc.search("w", {"query": {"range": {"field": "doc_id",
                                               "gte": 6, "lte": 8}},
                           "size": 10})
    assert _ids(res) == [6, 8]
    # Spark path (dsl._live second anti-join against the purge mask)
    eng = SparkSearchEngine(load_index_with_deletes(spark, ix),
                            svc._docs_view("w"))
    got = [r["doc_id"] for r in eng.search(
        {"range": {"field": "doc_id", "gte": 6, "lte": 8}},
        size=10).collect()]
    assert sorted(got) == [6, 8]
    # the purged id is recorded in the mask table
    dt = load_docs_tombstones(spark, ix)
    assert [r["doc_id"] for r in dt.collect()] == [7]


def test_readd_after_compaction_unmasks(spark, svc):
    ix = svc.catalog._dir("w")
    delete_docs(spark, ix, [7])
    compact_deletes(spark, ix)
    r = svc.add_documents("w", [{"doc_id": 7, "text": "alpha phoenix seven",
                                 "lang": "en"}])
    assert r["addedCount"] == 1 and r["duplicateCount"] == 0
    svc.snapshot("w")

    res = svc.search("w", {"query": {"term": {"field": "text",
                                              "value": "phoenix"}},
                           "size": 5})
    assert _ids(res) == [7]
    assert svc.search("w", {"query": {"match_all": {}},
                            "size": 1})["total"] == 30
    rng = svc.search("w", {"query": {"range": {"field": "doc_id",
                                               "gte": 6, "lte": 8}},
                           "size": 10})
    assert _ids(rng) == [6, 7, 8]
    # docs-run row (new values) wins over the immutable registered row
    assert next(h["text"] for h in rng["hits"]
                if h["doc_id"] == 7) == "alpha phoenix seven"
    # aggregations count the revived doc exactly ONCE (a sidecar holding
    # both the pre-delete and the re-added generation would double-count)
    agg = svc.search("w", {"query": {"match_all": {}}, "size": 0,
                           "aggregations": {"langs": {"terms": {
                               "field": "lang", "size": 5}}}})
    assert agg["aggregations"]["langs"]["buckets"][0]["doc_count"] == 30
    # fully re-added -> empty mask table is REMOVED, not left as junk
    assert load_docs_tombstones(spark, ix) is None
    assert docs_tombstones_path(ix) is None


def test_readd_live_doc_identical_is_duplicate(spark, svc):
    r = svc.add_documents("w", [{"doc_id": 3, "lang": "en",
                                 "text": "alpha old3 tok3"}])
    assert r["addedCount"] == 0 and r["duplicateCount"] == 1
    assert r["replacedCount"] == 0


def test_readd_live_doc_changed_is_replaced(spark, svc):
    r = svc.add_documents("w", [{"doc_id": 3, "text": "whatever",
                                 "lang": "en"}])
    assert r["addedCount"] == 1 and r["duplicateCount"] == 0
    assert r["replacedCount"] == 1
    assert _ids(svc.search("w", {"query": {"term": {
        "field": "text", "value": "whatever"}}, "size": 5})) == [3]
    assert _ids(svc.search("w", {"query": {"term": {
        "field": "text", "value": "old3"}}, "size": 5})) == []


def test_partial_unmask_keeps_other_purged_ids_masked(spark, svc):
    ix = svc.catalog._dir("w")
    delete_docs(spark, ix, [11, 12])
    compact_deletes(spark, ix)
    svc.add_documents("w", [{"doc_id": 11, "text": "alpha lives again",
                             "lang": "en"}])
    svc.snapshot("w")
    res = svc.search("w", {"query": {"range": {"field": "doc_id",
                                               "gte": 10, "lte": 13}},
                           "size": 10})
    assert _ids(res) == [10, 11, 13]
    dt = load_docs_tombstones(spark, ix)
    assert [r["doc_id"] for r in dt.collect()] == [12]
    assert svc.search("w", {"query": {"match_all": {}},
                            "size": 1})["total"] == 29


def test_mask_is_single_file_and_legacy_dir_readable(spark, svc):
    """The mask is one parquet file swapped with os.replace (crash leaves
    old-complete or new-complete, never nothing); indexes written by the
    earlier directory layout still load and migrate on the next rewrite."""
    ix = svc.catalog._dir("w")
    delete_docs(spark, ix, [21, 22])
    compact_deletes(spark, ix)
    fpath = os.path.join(ix, "docs_tombstones.parquet")
    assert os.path.isfile(fpath) and docs_tombstones_path(ix) == fpath
    assert not os.path.exists(fpath + ".tmp")

    # rewrite the mask into the legacy DIRECTORY layout by hand
    df = spark.read.parquet(fpath)
    legacy = os.path.join(ix, "docs_tombstones")
    df.coalesce(1).write.mode("overwrite").parquet(legacy)
    os.remove(fpath)
    assert docs_tombstones_path(ix) == legacy
    dt = load_docs_tombstones(spark, ix)
    assert sorted(r["doc_id"] for r in dt.collect()) == [21, 22]

    # next unmask rewrite migrates legacy dir -> single file
    svc.add_documents("w", [{"doc_id": 21, "text": "alpha returns",
                             "lang": "en"}])
    assert docs_tombstones_path(ix) == fpath
    assert not os.path.isdir(legacy)
    dt = load_docs_tombstones(spark, ix)
    assert [r["doc_id"] for r in dt.collect()] == [22]


def test_second_generation_run_wins_docs_view(spark, svc):
    """Two appended generations of the same id: the LATER run's values
    are what enrichment serves (window over docs_runs by generation)."""
    ix = svc.catalog._dir("w")
    delete_docs(spark, ix, [9])
    svc.add_documents("w", [{"doc_id": 9, "text": "alpha gen one",
                             "lang": "en"}])
    delete_docs(spark, ix, [9])
    svc.add_documents("w", [{"doc_id": 9, "text": "alpha gen two",
                             "lang": "en"}])
    svc.snapshot("w")
    res = svc.search("w", {"query": {"term": {"field": "text",
                                              "value": "gen"}}, "size": 5})
    assert _ids(res) == [9]
    assert res["hits"][0]["text"] == "alpha gen two"
    # first generation's postings are gone
    assert _ids(svc.search("w", {"query": {"term": {"field": "text",
                                                    "value": "one"}},
                                 "size": 5})) == []
    assert svc.search("w", {"query": {"match_all": {}},
                            "size": 1})["total"] == 30
