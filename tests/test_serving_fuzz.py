"""Randomized serving-vs-Spark parity over the FULL query DSL.

A seeded generator builds nested bool trees mixing inverted-index
operators (term/match/prefix/wildcard/fuzzy/phrase) with docs-table
operators (range/exists/geo_distance) and compares the serving path's
ranked results against the Spark DSL path on every query — ids exactly,
scores at rel 1e-12 (JVM ln vs libm log is 1 ulp). Queries that compile
to a serving fallback (ValueError 'serving surface') are asserted to be
EXPECTED fallbacks, never silent divergence."""

from __future__ import annotations

import random

import pytest

from search_engine_spark.operators.doc_values import (servable_fields,
                                                      write_doc_values)
from search_engine_spark.operators.index_build import (IndexConfig,
                                                       load_index,
                                                       write_index)
from search_engine_spark.operators.wand import write_blocks
from search_engine_spark.plans.dsl import SparkSearchEngine
from search_engine_spark.serving import ServingIndex

from test_agg_json import SCHEMA, WORDS, _row

N = 150
N_QUERIES = 60


@pytest.fixture(scope="module")
def fz(spark, tmp_path_factory):
    ixdir = str(tmp_path_factory.mktemp("fz") / "ix")
    docs = spark.createDataFrame([_row(i) for i in range(N)], SCHEMA)
    cfg = IndexConfig(id_col="doc_id",
                      fields={"name": "text", "content": "text",
                              "status": "keyword"}, n_buckets=8)
    write_index(docs, ixdir, cfg)
    idx = load_index(spark, ixdir)
    m = write_blocks(idx, ixdir)
    write_doc_values(docs, ixdir,
                     servable_fields(docs, "doc_id",
                                     exclude=("name", "content")),
                     includes_runs=m["includes_runs"])
    return SparkSearchEngine(idx, docs), ServingIndex(ixdir)


def _leaf(rng: random.Random) -> dict:
    kind = rng.choice(["term", "term", "match", "prefix", "wildcard",
                       "fuzzy", "phrase", "range_qty", "range_price",
                       "range_site", "exists", "geo"])
    w = rng.choice(WORDS)
    if kind == "term":
        f = rng.choice(["name", "content", "status"])
        v = w if f != "status" else rng.choice(
            ["active", "archived", "pending"])
        return {"term": {"field": f, "value": v}}
    if kind == "match":
        return {"match": {"field": rng.choice(["name", "content", "*"]),
                          "value": " ".join(
                              rng.sample(WORDS, rng.randint(1, 2)))}}
    if kind == "prefix":
        return {"prefix": {"field": "name", "value": w[:rng.randint(1, 3)]}}
    if kind == "wildcard":
        return {"wildcard": {"field": "content",
                             "value": f"{w[:2]}*{w[-1]}"}}
    if kind == "fuzzy":
        return {"fuzzy": {"field": "name", "value": w,
                          "fuzziness": rng.choice([1, 2])}}
    if kind == "phrase":
        return {"match_phrase": {
            "field": rng.choice(["content", "*"]),
            "value": " ".join(rng.sample(WORDS, 2)),
            "slop": rng.choice([0, 0, 1, 2])}}
    if kind == "range_qty":
        lo = rng.randint(0, 8)
        return {"range": {"field": "qty", "gte": lo,
                          "lt": lo + rng.randint(1, 6)}}
    if kind == "range_price":
        return {"range": {"field": "price",
                          rng.choice(["gte", "gt"]): rng.randint(0, 60),
                          rng.choice(["lte", "lt"]): rng.randint(61, 110)}}
    if kind == "range_site":
        return {"range": {"field": "site", "gte": f"s{rng.randint(0, 4)}"}}
    if kind == "exists":
        return {"exists": {"field": rng.choice(
            ["site", "price", "doc_id", "location.lat"])}}
    return {"geo_distance": {"field": "location",
                             "distance": f"{rng.randint(20, 200)}km",
                             "location": {"lat": 50.0, "lon": 8.0}}}


def _gen(rng: random.Random, depth: int = 0) -> dict:
    if depth >= 2 or rng.random() < 0.45:
        return _leaf(rng)
    node: dict = {}
    if rng.random() < 0.7:
        node["must"] = [_gen(rng, depth + 1)
                        for _ in range(rng.randint(1, 2))]
    if rng.random() < 0.6:
        node["should"] = [_gen(rng, depth + 1)
                          for _ in range(rng.randint(1, 3))]
        if rng.random() < 0.4 and len(node["should"]) > 1:
            node["minimum_should_match"] = rng.randint(
                1, len(node["should"]))
    if rng.random() < 0.35:
        node["must_not"] = [_gen(rng, depth + 1)]
    if rng.random() < 0.3:
        node["filter"] = [_gen(rng, depth + 1)]
    if not node:
        node["must"] = [_leaf(rng)]
    return {"bool": node}


def test_random_queries_parity(fz):
    eng, srv = fz
    rng = random.Random(0xC0FFEE)
    checked = fallbacks = nonempty = 0
    for qi in range(N_QUERIES):
        q = _gen(rng)
        try:
            got = srv.search(q, k=40, use_cache=False)
        except ValueError as e:
            assert "serving surface" in str(e), (q, e)
            fallbacks += 1
            continue
        want = [(r["doc_id"], r["score"])
                for r in eng.search(q, size=40).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12, abs=1e-15), (q, gd)
        checked += 1
        nonempty += bool(want)
    # the generator must actually exercise the surface, not fall through
    assert checked >= N_QUERIES * 0.8, (checked, fallbacks)
    assert nonempty >= N_QUERIES * 0.5, nonempty
