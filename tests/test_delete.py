"""Merge-on-read deletes: tombstoned docs vanish from queries with correct
post-delete BM25 stats; compaction equals a fresh build of the survivors."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.delete import (compact_deletes,
                                                  delete_docs,
                                                  load_index_with_deletes)
from search_engine_spark.operators.index_build import (IndexConfig,
                                                       write_index)
from search_engine_spark.plans.dsl import SparkSearchEngine
from search_engine_spark.sources.synth import synth_pages

CFG = dict(id_col="doc_id", fields={"text": "text"}, n_buckets=4)


@pytest.fixture()
def built(tmp_path, spark):
    pages = synth_pages(spark, 300).cache()
    d = str(tmp_path / "ix")
    write_index(pages, d, IndexConfig(**CFG))
    return d, pages


def test_delete_hides_docs_and_updates_stats(spark, built):
    d, pages = built
    doomed = [0, 5, 10, 150]
    meta = delete_docs(spark, d, doomed)
    assert meta["total_docs"] == 300 - 4
    assert meta["n_tombstones"] == 4

    idx = load_index_with_deletes(spark, d)
    eng = SparkSearchEngine(idx, pages)
    hits = {r["doc_id"] for r in eng.candidates({"match_all": {}}).collect()}
    assert hits.isdisjoint(doomed)
    assert len(hits) == 296

    # term df shrinks for terms only the deleted docs held
    top = eng.search({"match": {"field": "text", "value": "za"}}, size=300)
    ids = {r["doc_id"] for r in top.collect()}
    assert ids.isdisjoint(doomed)


def test_compact_equals_fresh_build(tmp_path, spark, built):
    d, pages = built
    doomed = list(range(0, 100))
    delete_docs(spark, d, doomed)
    meta = compact_deletes(spark, d)
    assert meta["total_docs"] == 200
    assert "n_tombstones" not in meta

    fresh_dir = str(tmp_path / "fresh")
    survivors = pages.where(~F.col("doc_id").isin(doomed))
    write_index(survivors, fresh_dir, IndexConfig(**CFG))

    a = load_index_with_deletes(spark, d)       # no tombstones left
    from search_engine_spark.operators.index_build import load_index
    b = load_index(spark, fresh_dir)
    sa = {tuple(r) for r in a.postings.select("field", "term", "doc_id", "tf").collect()}
    sb = {tuple(r) for r in b.postings.select("field", "term", "doc_id", "tf").collect()}
    assert sa == sb
    assert a.total_docs == b.total_docs
    assert abs(a.avg_dl - b.avg_dl) < 1e-12

    # idempotent: second delete+compact cycle still consistent
    delete_docs(spark, d, [100])
    compact_deletes(spark, d)
    c = load_index_with_deletes(spark, d)
    assert c.total_docs == 199
