"""Physical-plan assertions: the properties that make queries survive a
100x scale-up must be visible in the executed plan, not just hoped for.

- term lookups: PushedFilters on (field, term) + bucket PartitionFilters on
  the postings FileScan (scan prunes to the term's bucket partitions);
- term_stats joined via BroadcastHashJoin (never a shuffle for the tiny
  stats side);
- top-k executes as TakeOrderedAndProject (per-partition top-k + driver
  merge, no global sort);
- no CartesianProduct anywhere;
- stopword config changes tokens (wired through the build).
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import (IndexConfig,
                                                       build_index,
                                                       load_index,
                                                       write_index)
from search_engine_spark.plans.dsl import SparkSearchEngine
from search_engine_spark.sources.synth import synth_pages


@pytest.fixture(scope="module")
def persisted(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("planix"))
    pages = synth_pages(spark, 500).cache()
    write_index(pages, d, IndexConfig(id_col="doc_id",
                                      fields={"text": "text"}, n_buckets=8))
    idx = load_index(spark, d)
    return SparkSearchEngine(idx, pages)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_scan_pushdown_and_bucket_pruning(persisted):
    df = persisted.search({"term": {"field": "text", "value": "za"}})
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "EqualTo(term,za)" in plan.replace(" ", "").replace("#", "") \
        or "term), (term" in plan or "(term#" in plan
    # bucket partition filter made it into the scan
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:400]


def test_term_stats_broadcast(persisted):
    df = persisted.search({"match": {"field": "text", "value": "za"}})
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_is_take_ordered(persisted):
    df = persisted.search({"match": {"field": "text", "value": "za"}}, size=10)
    assert "TakeOrderedAndProject" in _plan(df)


def test_no_cartesian_in_bool(persisted):
    q = {"bool": {"must": [{"term": {"field": "text", "value": "za"}}],
                  "must_not": [{"term": {"field": "text", "value": "ba"}}],
                  "should": [{"term": {"field": "text", "value": "do"}}]}}
    assert "CartesianProduct" not in _plan(persisted.candidates(q))


def test_stopwords_wired_through_build(spark):
    df = spark.createDataFrame([(1, "the quick fox the end")],
                               "doc_id long, text string")
    ix = build_index(df, IndexConfig(fields={"text": "text"},
                                     stopwords=("the",)))
    terms = {r["term"] for r in ix.postings.collect()}
    assert "the" not in terms
    assert {"quick", "fox", "end"} <= terms
    dl = ix.doc_stats.collect()[0]["dl"]
    assert dl == 3  # stopwords excluded from doc length too
