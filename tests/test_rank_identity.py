"""Rank identity: Spark top-k == oracle top-k (exact ranks, scores to 1e-9,
canonical tie-break score desc then doc_id asc) over the full reference
query set, plus pagination sweeps (BASELINE.md §2 acceptance)."""

import pytest

from tests.queryset import PAGINATION, QUERIES


def _spark_topk(engine, q, size=10, from_=0):
    return [(r["doc_id"], r["score"])
            for r in engine.search(q, size=size, from_=from_).collect()]


@pytest.mark.parametrize("name,query", QUERIES, ids=[n for n, _ in QUERIES])
def test_topk_rank_identity(spark_engine, oracle_engine, name, query):
    got = _spark_topk(spark_engine, query)
    want = oracle_engine.search(query)
    assert [g[0] for g in got] == [w[0] for w in want], \
        f"{name}: ranks differ\n got {got}\nwant {want}"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9, f"{name}: score {gd}: {gs} vs {ws}"


@pytest.mark.parametrize("from_,size", PAGINATION)
def test_pagination_sweep(spark_engine, oracle_engine, from_, size):
    q = {"match": {"field": "name", "value": "apple"}}
    got = _spark_topk(spark_engine, q, size=size, from_=from_)
    want = oracle_engine.search(q, size=size, from_=from_)
    assert [g[0] for g in got] == [w[0] for w in want]


def test_pagination_is_consistent_slicing(spark_engine):
    q = {"term": {"field": "status", "value": "active"}}
    full = _spark_topk(spark_engine, q, size=20, from_=0)
    p1 = _spark_topk(spark_engine, q, size=10, from_=0)
    p2 = _spark_topk(spark_engine, q, size=10, from_=10)
    assert full == p1 + p2


def test_zero_score_docs_rank_by_doc_id(spark_engine, oracle_engine):
    # filter-only query: every candidate scores 0 -> pure doc_id asc order
    q = {"bool": {"filter": [{"range": {"field": "price", "gte": 1}}]}}
    got = _spark_topk(spark_engine, q)
    want = oracle_engine.search(q)
    assert [g[0] for g in got] == [w[0] for w in want]
    assert all(s == 0.0 for _, s in got)


def test_should_contributes_score_not_membership(spark_engine, oracle_engine):
    must_only = {"bool": {"must": [{"term": {"field": "type", "value": "gadget"}}]}}
    with_should = {"bool": {
        "must": [{"term": {"field": "type", "value": "gadget"}}],
        "should": [{"match": {"field": "name", "value": "hello"}}]}}
    c1 = {r["doc_id"] for r in spark_engine.candidates(must_only).collect()}
    c2 = {r["doc_id"] for r in spark_engine.candidates(with_should).collect()}
    assert c1 == c2  # membership unchanged
    got = _spark_topk(spark_engine, with_should, size=len(c1) or 1)
    want = oracle_engine.search(with_should, size=len(c1) or 1)
    assert [g[0] for g in got] == [w[0] for w in want]
