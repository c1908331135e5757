"""Over-limit expansion frames (score_terms_df) must keep scoring through
bool composition, and the scoring joins must stay query-sized.

A wildcard/fuzzy expansion beyond COLLECT_TERMS_LIMIT is carried as a
DataFrame instead of a collected list; before round 4 `_bool` dropped the
frame when merging children, silently un-scoring the expansion inside any
bool query. These tests force the df path by shrinking the limit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import IndexConfig, build_index
from search_engine_spark.plans import dsl as dsl_mod
from search_engine_spark.plans.dsl import SparkSearchEngine


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpa alpb beta"),
        (2, "alpa beta beta"),
        (3, "alpb alpc gamma"),
        (4, "beta gamma delta"),
        (5, "alpc alpd alpa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ix = build_index(docs, IndexConfig(id_col="doc_id",
                                       fields={"text": "text"}))
    return docs, ix


QUERIES = [
    {"bool": {"should": [{"wildcard": {"field": "text", "value": "alp*"}},
                         {"term": {"field": "text", "value": "beta"}}]}},
    {"bool": {"must": [{"wildcard": {"field": "text", "value": "alp*"}}],
              "must_not": [{"term": {"field": "text", "value": "delta"}}]}},
    {"wildcard": {"field": "text", "value": "alp*"}},
]


def _scores(engine, q):
    return {(r["doc_id"], r["score"])
            for r in engine.search_scored(q).collect()}


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_df_path_scores_match_literal_path(spark, corpus, monkeypatch, qi):
    docs, ix = corpus
    eng = SparkSearchEngine(ix, docs)
    expected = _scores(eng, QUERIES[qi])   # literal IN-list path
    assert any(s != 0.0 for _, s in expected)
    monkeypatch.setattr(dsl_mod, "COLLECT_TERMS_LIMIT", 1)
    got = _scores(eng, QUERIES[qi])        # forced expansion-frame path
    assert got == expected


def test_term_stats_broadcast_is_filtered(spark, corpus):
    """The frame handed to F.broadcast must carry the query's pair filter,
    not the whole dictionary (1e9-term vocabularies can't broadcast)."""
    docs, ix = corpus
    eng = SparkSearchEngine(ix, docs)
    scored = eng.search_scored({"term": {"field": "text", "value": "beta"}})
    plan = scored._jdf.queryExecution().optimizedPlan().toString()
    import re
    # every term_stats-side branch feeding a join is filtered on term
    assert re.search(r"term#\d+ IN|term#\d+ = beta|isin", plan) or \
        "beta" in plan
    stats = eng._term_stats_for([("text", "beta")])
    assert stats.count() == 1
