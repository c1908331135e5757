"""DSL membership semantics: Spark candidates == oracle candidates for the
whole reference query set (FIXTURES.md §3), plus operator edge cases ported
from the reference vitest suites (SURVEY.md §5)."""

import pytest

from tests.queryset import QUERIES


def _spark_cands(engine, q):
    return {r["doc_id"] for r in engine.candidates(q).collect()}


@pytest.mark.parametrize("name,query", QUERIES, ids=[n for n, _ in QUERIES])
def test_candidates_match_oracle(spark_engine, oracle_engine, name, query):
    got = _spark_cands(spark_engine, query)
    want = oracle_engine.candidates(query)
    assert got == want, f"{name}: spark-only={got - want} oracle-only={want - got}"


def test_match_all_returns_everything(spark_engine, oracle_engine):
    assert len(_spark_cands(spark_engine, {"match_all": {}})) == \
        oracle_engine.ix.total_docs


def test_empty_should_matches_nothing(spark_engine):
    assert _spark_cands(spark_engine, {"bool": {"should": []}}) == set()


def test_must_not_alone_matches_nothing(spark_engine, oracle_engine):
    q = {"bool": {"must_not": [{"term": {"field": "status", "value": "active"}}]}}
    assert _spark_cands(spark_engine, q) == oracle_engine.candidates(q) == set()


def test_term_is_not_analyzed_but_lowercased(spark_engine, oracle_engine):
    # 'ACTIVE' -> lowercase 'active' exact dictionary hit
    q = {"term": {"field": "status", "value": "ACTIVE"}}
    got = _spark_cands(spark_engine, q)
    assert got == oracle_engine.candidates(q)
    assert len(got) > 0
    # multi-word term value is NOT analyzed -> no dictionary token matches
    q2 = {"term": {"field": "content", "value": "quick brown"}}
    assert _spark_cands(spark_engine, q2) == set()


def test_match_analyzes_multiword_and(spark_engine, oracle_engine):
    q = {"match": {"field": "content", "value": "quick fox"}}
    got = _spark_cands(spark_engine, q)
    want = oracle_engine.candidates(q)
    assert got == want
    assert len(got) > 0


def test_fuzzy_fuzziness_bands(spark_engine, oracle_engine):
    # vitest fixture words: hello / helo(1) / hxllo(1 sub) / hxylzo(3)
    for fz, value in [(0, "hello"), (1, "helo"), (2, "hxllo")]:
        q = {"fuzzy": {"field": "name", "value": value, "fuzziness": fz}} \
            if fz else {"term": {"field": "name", "value": value}}
        assert _spark_cands(spark_engine, q) == oracle_engine.candidates(q)


def test_fuzzy_wider_than_exact(spark_engine):
    exact = _spark_cands(spark_engine, {"term": {"field": "name", "value": "hello"}})
    fuzzy = _spark_cands(spark_engine, {"fuzzy": {"field": "name", "value": "hello",
                                                  "fuzziness": 2}})
    assert exact <= fuzzy
    assert len(fuzzy) > len(exact)


def test_phrase_slop_monotone(spark_engine, oracle_engine):
    prev = set()
    for slop in (0, 1, 2):
        q = {"match_phrase": {"field": "content", "value": "quick brown fox",
                              "slop": slop}}
        got = _spark_cands(spark_engine, q)
        assert got == oracle_engine.candidates(q), f"slop={slop}"
        assert prev <= got  # larger slop only adds docs
        prev = got
    assert len(prev) > 0


def test_phrase_word_order_matters(spark_engine, oracle_engine):
    q = {"match_phrase": {"field": "content", "value": "fox brown quick"}}
    assert _spark_cands(spark_engine, q) == oracle_engine.candidates(q)


def test_range_variants(spark_engine, oracle_engine):
    for body in [{"field": "price", "gte": 100, "lte": 200},
                 {"field": "price", "gt": 100, "lt": 200},
                 {"field": "rating", "gte": 4.5},
                 {"field": "age", "lt": 30}]:
        q = {"range": body}
        assert _spark_cands(spark_engine, q) == oracle_engine.candidates(q)


def test_geo_distance_formats(spark_engine, oracle_engine):
    center = {"lat": 40.7128, "lon": -74.0060}
    for dist in [10, "10km", "10000m", "10"]:
        q = {"geo_distance": {"field": "location", "center": center,
                              "distance": dist}}
        got = _spark_cands(spark_engine, q)
        assert got == oracle_engine.candidates(q), f"distance={dist}"
    # all four forms are the same 10km radius
    qs = [{"geo_distance": {"field": "location", "center": center, "distance": d}}
          for d in [10, "10km", "10000m", "10"]]
    sets = [_spark_cands(spark_engine, q) for q in qs]
    assert all(s == sets[0] for s in sets)


def test_minimum_should_match_counts(spark_engine, oracle_engine):
    base = {"bool": {
        "filter": [{"match_all": {}}],
        "should": [{"term": {"field": "status", "value": "active"}},
                   {"term": {"field": "brand", "value": "acme"}},
                   {"term": {"field": "type", "value": "gadget"}}]}}
    prev = None
    for m in (1, 2, 3):
        q = {"bool": dict(base["bool"], minimum_should_match=m)}
        got = _spark_cands(spark_engine, q)
        assert got == oracle_engine.candidates(q), f"msm={m}"
        if prev is not None:
            assert got <= prev  # higher m only shrinks
        prev = got


def test_nested_path_prefixing(spark_engine, oracle_engine):
    q = {"nested": {"path": "meta", "query": {"match": {"field": "author",
                                                        "value": "bob"}}}}
    got = _spark_cands(spark_engine, q)
    direct = _spark_cands(spark_engine, {"match": {"field": "meta.author",
                                                   "value": "bob"}})
    assert got == direct == oracle_engine.candidates(q)
    assert len(got) > 0


def test_wildcard_escapes_regex_metachars(spark_engine, oracle_engine):
    # a dot in the pattern must be literal, not regex-any
    q = {"wildcard": {"field": "email", "value": "*@example1.com"}}
    assert _spark_cands(spark_engine, q) == oracle_engine.candidates(q)


def test_search_hits_enrichment(spark_engine, docs_df):
    q = {"match": {"field": "name", "value": "hello"}}
    hits = spark_engine.search_hits(q, size=5).collect()
    plain = spark_engine.search(q, size=5).collect()
    assert [h["id"] for h in hits] == [p["doc_id"] for p in plain]
    assert [h["score"] for h in hits] == [p["score"] for p in plain]
    assert "name" in hits[0].asDict() and "price" in hits[0].asDict()


def test_field_boosts_scale_scores(docs_index, docs_df):
    from search_engine_spark.plans.dsl import SparkSearchEngine
    q = {"match": {"field": "name", "value": "hello"}}
    base = {r["doc_id"]: r["score"] for r in
            SparkSearchEngine(docs_index, docs_df).search_scored(q).collect()}
    boosted = {r["doc_id"]: r["score"] for r in
               SparkSearchEngine(docs_index, docs_df,
                                 field_boosts={"name": 2.0})
               .search_scored(q).collect()}
    assert set(base) == set(boosted)
    for d, s in base.items():
        assert boosted[d] == pytest.approx(2.0 * s, rel=1e-12)


def test_exists_and_missing(spark_engine, docs_df):
    got = {r["doc_id"] for r in
           spark_engine.candidates({"exists": {"field": "email"}}).collect()}
    want = {r["id"] for r in docs_df.where("email is not null").collect()}
    assert got == want
    missing = {r["doc_id"] for r in spark_engine.candidates(
        {"bool": {"must": [{"match_all": {}}],
                  "must_not": [{"exists": {"field": "email"}}]}}).collect()}
    assert missing == {r["id"] for r in
                       docs_df.where("email is null").collect()}
    assert spark_engine.candidates({"exists": {"field": "zzz"}}).count() == 0


def test_suggest_prefix(spark_engine):
    rows = spark_engine.suggest("name", "app", size=5).collect()
    assert rows, "expected completions for 'app'"
    assert all(r["term"].startswith("app") for r in rows)
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
