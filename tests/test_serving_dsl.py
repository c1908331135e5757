"""Serving-path DSL completion (round-3): phrase over position blocks +
prefix/wildcard/fuzzy/bool(must_not) answered off the block index, result-
identical to the Spark DSL path (QueryProcessor.ts:74-111 parity — the
reference answers its whole DSL in-process; this is the engine's
millisecond equivalent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import (IndexConfig,
                                                       load_index,
                                                       write_index)
from search_engine_spark.operators.wand import write_blocks
from search_engine_spark.plans.dsl import SparkSearchEngine
from search_engine_spark.serving import ServingIndex

WORDS = ["hello", "apple", "banana", "quick", "brown", "fox", "jumps",
         "lazy", "dog", "active", "helo", "application", "nothing"]


def _corpus(spark, n=90):
    rows = []
    for i in range(n):
        name = f"{WORDS[i % 6]} {WORDS[(i * 3) % 13]} item{i % 11}"
        content = " ".join(WORDS[(i + j) % 13] for j in range(7))
        if i % 9 == 0:
            content += " quick brown fox"
        status = "active" if i % 3 else "archived"
        rows.append((i, name, content, status))
    return spark.createDataFrame(
        rows, "doc_id long, name string, content string, status string")


QUERIES = [
    {"term": {"field": "name", "value": "hello"}},
    {"term": {"field": "status", "value": "active"}},
    {"match": {"field": "content", "value": "quick brown"}},
    {"match": {"field": "*", "value": "apple"}},
    {"prefix": {"field": "name", "value": "app"}},
    {"prefix": {"field": "name", "value": "APP"}},
    {"wildcard": {"field": "name", "value": "app*"}},
    {"wildcard": {"field": "content", "value": "*llo"}},
    {"wildcard": {"field": "name", "value": "h?llo"}},
    {"fuzzy": {"field": "name", "value": "helo"}},
    {"fuzzy": {"field": "name", "value": "helo", "fuzziness": 1}},
    {"match_phrase": {"field": "content", "value": "quick brown fox"}},
    {"match_phrase": {"field": "content", "value": "quick fox", "slop": 1}},
    {"match_phrase": {"field": "*", "value": "quick brown"}},
    {"match_phrase": {"field": "*", "value": "quick fox", "slop": 2}},
    {"bool": {"must": [{"term": {"field": "status", "value": "active"}},
                       {"match": {"field": "name", "value": "hello"}}]}},
    {"bool": {"should": [{"match": {"field": "name", "value": "hello"}},
                         {"match": {"field": "name", "value": "apple"}},
                         {"term": {"field": "content", "value": "dog"}}]}},
    {"bool": {"must": [{"term": {"field": "status", "value": "active"}}],
              "should": [{"term": {"field": "name", "value": "hello"}},
                         {"term": {"field": "content", "value": "fox"}},
                         {"term": {"field": "content", "value": "dog"}}],
              "minimum_should_match": 2}},
    {"bool": {"must": [{"term": {"field": "status", "value": "active"}}],
              "must_not": [{"term": {"field": "name", "value": "hello"}},
                           {"prefix": {"field": "name", "value": "app"}}]}},
    {"bool": {"filter": [{"term": {"field": "status", "value": "active"}}],
              "should": [{"match": {"field": "name", "value": "hello"}}]}},
    {"bool": {"should": []}},
    {"bool": {"must": [{"term": {"field": "name", "value": "zzznope"}}],
              "should": [{"term": {"field": "name", "value": "hello"}}]}},
    {"match_all": {}},
]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    ixdir = str(tmp_path_factory.mktemp("srv") / "ix")
    docs = _corpus(spark)
    cfg = IndexConfig(id_col="doc_id",
                      fields={"name": "text", "content": "text",
                              "status": "keyword"}, n_buckets=8)
    write_index(docs, ixdir, cfg)
    idx = load_index(spark, ixdir)
    write_blocks(idx, ixdir)
    return SparkSearchEngine(idx, docs), ServingIndex(ixdir)


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_serving_matches_dsl(setup, qi):
    eng, srv = setup
    q = QUERIES[qi]
    want = [(r["doc_id"], r["score"])
            for r in eng.search(q, size=25).collect()]
    got = srv.search(q, k=25)
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12, abs=1e-15), (q, gd)


def test_phrase_members_match_dsl(setup):
    eng, srv = setup
    q = {"match_phrase": {"field": "content", "value": "quick brown fox"}}
    want = sorted(r["doc_id"] for r in eng.candidates(q).collect())
    got = srv.phrase("content", "quick brown fox", members_only=True)
    assert got == want and got  # non-trivial


def test_multifield_phrase_members_match_dsl(setup):
    # '*' merges each token's positions across name/content/status — the
    # serving path must accept exactly the DSL's per-doc collect_set-union
    # semantics, in both the exact keyed path and the sloppy greedy path
    eng, srv = setup
    for q in ({"match_phrase": {"field": "*", "value": "quick brown"}},
              {"match_phrase": {"field": "*", "value": "quick fox",
                                "slop": 2}}):
        want = sorted(r["doc_id"] for r in eng.candidates(q).collect())
        body = q["match_phrase"]
        got = srv.phrase("*", body["value"], slop=body.get("slop", 0),
                         members_only=True)
        assert got == want and got, q


def test_phrase_latency_budget(setup):
    import time
    _, srv = setup
    srv.phrase("content", "quick brown", k=10)  # warm
    t0 = time.time()
    for _ in range(5):
        srv.phrase("content", "quick brown", k=10)
    p = (time.time() - t0) / 5
    assert p < 0.05, f"serving phrase {p * 1000:.1f} ms >= 50 ms"


def test_zero_k_and_far_pagination(setup):
    # k=0 / from_ past everything must return [] (regression: the
    # partition-select top-k crashed on kth == n)
    _, srv = setup
    assert srv.topk("name", ["hello"], k=0) == []
    assert srv.phrase("content", "quick brown", k=0) == []
    assert srv.search({"term": {"field": "name", "value": "hello"}},
                      k=0) == []
    assert srv.search({"term": {"field": "name", "value": "hello"}},
                      k=10, from_=100000) == []


def test_suggest_matches_dsl(setup):
    eng, srv = setup
    want = [(r["term"], r["df"])
            for r in eng.suggest("name", "a", size=5).collect()]
    assert srv.suggest("name", "a", size=5) == want and want


def test_docs_table_ops_rejected(setup):
    # docs-table operators need the doc-values sidecar (this fixture
    # writes none) — they raise the fallback marker instead of silently
    # returning empty (tests/test_agg_json.py covers the served case)
    _, srv = setup
    with pytest.raises(ValueError, match="serving surface"):
        srv.search({"range": {"field": "doc_id", "gte": 1}})
    with pytest.raises(ValueError, match="serving surface"):
        srv.search({"nested": {"path": "meta",
                               "query": {"term": {"field": "meta.author",
                                                  "value": "x"}}}})


def test_stemmed_serving_search(spark, tmp_path):
    rows = [(0, "the running table is here"), (1, "tables run fast"),
            (2, "nothing relevant")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                      n_buckets=4, stem_lang="en")
    ixdir = str(tmp_path / "ix")
    write_index(docs, ixdir, cfg)
    idx = load_index(spark, ixdir)
    write_blocks(idx, ixdir)
    srv = ServingIndex(ixdir)
    got = srv.search({"match_phrase": {"field": "text",
                                       "value": "running tables"}}, k=10)
    assert [d for d, _ in got] == [0]
    got2 = srv.search({"prefix": {"field": "text", "value": "tab"}}, k=10)
    assert sorted(d for d, _ in got2) == [0, 1]


def test_randomized_multifield_phrase_parity(spark, tmp_path):
    # randomized corpora + random 2-3 token phrases (repeats allowed, so
    # the merged-occurrence LRU and the repeated-token fold are exercised)
    # must agree with the DSL on members for slop 0/1/2, single and '*'
    import random

    from search_engine_spark.operators.index_build import (IndexConfig,
                                                           load_index,
                                                           write_index)
    from search_engine_spark.operators.wand import write_blocks
    from search_engine_spark.plans.dsl import SparkSearchEngine
    from search_engine_spark.serving import ServingIndex

    rng = random.Random(42)
    vocab = ["ax", "bee", "cod", "dew", "elk", "fig"]
    rows = []
    for i in range(120):
        f1 = " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 8)))
        f2 = " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 8)))
        rows.append((i, f1, f2))
    docs = spark.createDataFrame(rows, "doc_id long, a string, b string")
    ixdir = str(tmp_path / "ix")
    cfg = IndexConfig(id_col="doc_id", fields={"a": "text", "b": "text"},
                      n_buckets=8)
    write_index(docs, ixdir, cfg)
    idx = load_index(spark, ixdir)
    write_blocks(idx, ixdir)
    eng = SparkSearchEngine(idx, docs)
    srv = ServingIndex(ixdir)
    n_nonempty = 0
    for trial in range(12):
        toks = [rng.choice(vocab) for _ in range(rng.randint(2, 3))]
        field = rng.choice(["a", "b", "*"])
        slop = rng.choice([0, 0, 1, 2])
        q = {"match_phrase": {"field": field, "value": " ".join(toks),
                              "slop": slop}}
        want = sorted(r["doc_id"] for r in eng.candidates(q).collect())
        got = srv.phrase(field, " ".join(toks), slop=slop,
                         members_only=True)
        assert got == want, (q, got[:5], want[:5])
        n_nonempty += bool(want)
    assert n_nonempty >= 6  # the comparison wasn't vacuous
