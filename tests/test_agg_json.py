"""JSON aggregation surface (SearchEngine.ts:971-1100 parity):

1. the Spark compiler (operators/agg_compile.py) vs a pure-Python oracle
   implementing the reference's bucket math over the matched doc set;
2. the millisecond serving twin (ServingIndex.aggregate over the
   doc-values sidecar) vs the Spark compiler — EXACT dict equality;
3. the can_aggregate gate (types/fields/kinds the sidecar can answer);
4. sidecar staleness: LSM runs appended after write_doc_values make the
   serving path refuse (fall back), never undercount.
"""

from __future__ import annotations

import datetime as dt

import pytest

from search_engine_spark.operators.agg_compile import compile_aggregations
from search_engine_spark.operators.doc_values import (doc_values_frame,
                                                      servable_fields,
                                                      write_doc_values)
from search_engine_spark.operators.index_build import (IndexConfig,
                                                       load_index,
                                                       write_index)
from search_engine_spark.operators.wand import write_blocks
from search_engine_spark.plans.dsl import SparkSearchEngine
from search_engine_spark.serving import ServingIndex

WORDS = ["hello", "apple", "banana", "quick", "brown", "fox", "jumps",
         "lazy", "dog", "active", "helo", "application", "nothing"]
STATUSES = ["active", "archived", "pending"]
EPOCH = dt.datetime(2025, 1, 1)  # naive — session tz pinned to UTC

N = 120


def _row(i: int) -> dict:
    return {
        "doc_id": i,
        "name": f"{WORDS[i % 6]} {WORDS[(i * 3) % 13]}",
        "content": " ".join(WORDS[(i + j) % 13] for j in range(6)),
        "status": STATUSES[i % 3],
        "site": f"s{i % 5}" if i % 17 else None,  # some nulls
        "price": float((i * 7) % 100) + 0.5 if i % 11 else None,
        "qty": i % 13,
        "flag": i % 2 == 0,
        "ts": EPOCH + dt.timedelta(hours=5 * i),
        "location": ({"lat": 50.0 + (i % 7 - 3) * 0.3,
                      "lon": 8.0 + (i % 5 - 2) * 0.4}
                     if i % 13 else None),
    }


SCHEMA = ("doc_id long, name string, content string, status string, "
          "site string, price double, qty long, flag boolean, ts timestamp, "
          "location struct<lat: double, lon: double>")

AGGS = {
    "sites": {"terms": {"field": "site", "size": 3}},
    "qty_terms": {"terms": {"field": "qty", "size": 5}},
    "flags": {"terms": {"field": "flag", "size": 3}},
    "price_hist": {"histogram": {"field": "price", "interval": 25}},
    "by_day": {"date_histogram": {"field": "ts", "interval": "1d"}},
    "price_ranges": {"range": {"field": "price", "ranges": [
        {"to": 25}, {"from": 25, "to": 75, "key": "mid"}, {"from": 75}]}},
    "cheap": {"filter": {"range": {"field": "price", "lt": 50}},
              "aggs": {"sites": {"terms": {"field": "site", "size": 10}}}},
    "s1ish": {"filter": {"match": {"field": "site", "value": "S1"}}},
    "s2_eq": {"filter": {"term": {"field": "site", "value": "s2"}}},
    "everything": {"global": {"aggs": {
        "sites": {"terms": {"field": "site", "size": 10}}}}},
}

QUERY = {"term": {"field": "status", "value": "active"}}


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    ixdir = str(tmp_path_factory.mktemp("aggix") / "ix")
    docs = spark.createDataFrame([_row(i) for i in range(N)], SCHEMA)
    cfg = IndexConfig(id_col="doc_id",
                      fields={"name": "text", "content": "text",
                              "status": "keyword"}, n_buckets=8)
    write_index(docs, ixdir, cfg)
    idx = load_index(spark, ixdir)
    metrics = write_blocks(idx, ixdir)
    fields = servable_fields(docs, "doc_id",
                             exclude=("name", "content"))
    write_doc_values(docs, ixdir, fields,
                     includes_runs=metrics["includes_runs"])
    eng = SparkSearchEngine(idx, docs)
    return docs, eng, ServingIndex(ixdir), ixdir


# -- pure-Python oracle (reference bucket math, deterministic ties) --------

def _matched_rows():
    return [r for r in map(_row, range(N)) if r["status"] == "active"]


def _key_str(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _oracle(rows):
    from collections import Counter

    def terms(field, size):
        c = Counter(_key_str(r[field]) for r in rows if r[field] is not None)
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
        return {"buckets": [{"key": k, "doc_count": n} for k, n in top]}

    out = {"sites": terms("site", 3), "qty_terms": terms("qty", 5),
           "flags": terms("flag", 3)}
    c = Counter()
    for r in rows:
        if r["price"] is not None:
            c[(r["price"] // 25) * 25] += 1
    out["price_hist"] = {"buckets": [
        {"key": int(k), "doc_count": c[k]} for k in sorted(c)]}
    c = Counter()
    for r in rows:
        ms = int(r["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
        c[(ms // 86_400_000) * 86_400_000] += 1
    out["by_day"] = {"buckets": [
        {"key": dt.datetime.fromtimestamp(k / 1000, tz=dt.timezone.utc)
              .strftime("%Y-%m-%dT%H:%M:%S.000Z"),
         "key_as_string": dt.datetime.fromtimestamp(
             k / 1000, tz=dt.timezone.utc)
              .strftime("%Y-%m-%dT%H:%M:%S.000Z"),
         "doc_count": c[k]} for k in sorted(c)]}
    prices = [r["price"] for r in rows if r["price"] is not None]
    out["price_ranges"] = {"buckets": [
        {"key": "*-25", "from": None, "to": 25,
         "doc_count": sum(p < 25 for p in prices)},
        {"key": "mid", "from": 25, "to": 75,
         "doc_count": sum(25 <= p < 75 for p in prices)},
        {"key": "75-*", "from": 75, "to": None,
         "doc_count": sum(p >= 75 for p in prices)}]}
    cheap = [r for r in rows if r["price"] is not None and r["price"] < 50]
    cc = Counter(r["site"] for r in cheap if r["site"] is not None)
    out["cheap"] = {"doc_count": len(cheap), "sites": {"buckets": [
        {"key": k, "doc_count": n} for k, n in
        sorted(cc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]}}
    out["s1ish"] = {"doc_count": sum(
        1 for r in rows if r["site"] is not None and "s1" in r["site"])}
    out["s2_eq"] = {"doc_count": sum(
        1 for r in rows if r["site"] == "s2")}
    allc = Counter(r["site"] for r in map(_row, range(N))
                   if r["site"] is not None)
    out["everything"] = {"doc_count": N, "sites": {"buckets": [
        {"key": k, "doc_count": n} for k, n in
        sorted(allc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]}}
    return out


def test_spark_compiler_matches_reference_math(setup):
    docs, eng, _, _ = setup
    hits = eng.candidates(QUERY).select("doc_id")
    got = compile_aggregations(AGGS, docs, hits)
    assert got == _oracle(_matched_rows())


def test_serving_twin_matches_spark_exactly(setup):
    docs, eng, srv, _ = setup
    hits = eng.candidates(QUERY).select("doc_id")
    want = compile_aggregations(AGGS, docs, hits)
    pairs, total, got = srv.search_with_aggs(QUERY, AGGS, k=10)
    assert got == want
    assert total == eng.candidates(QUERY).count()
    # hits come from the same compile — spot-check against the DSL path
    dsl = [(r["doc_id"], r["score"])
           for r in eng.search(QUERY, size=10).collect()]
    assert [d for d, _ in pairs] == [d for d, _ in dsl]


def test_global_scope_isolated_from_query(setup):
    docs, eng, srv, _ = setup
    # a query matching nothing still aggregates globally inside `global`
    q = {"term": {"field": "status", "value": "zzznope"}}
    aggs = {"g": {"global": {"aggs": {
        "sites": {"terms": {"field": "site", "size": 10}}}}},
        "sites": {"terms": {"field": "site", "size": 10}}}
    hits = eng.candidates(q).select("doc_id")
    want = compile_aggregations(aggs, docs, hits)
    _, total, got = srv.search_with_aggs(q, aggs, k=5)
    assert total == 0
    assert got == want
    assert got["sites"]["buckets"] == []          # scoped: empty
    assert got["g"]["doc_count"] == N             # global: everything


def test_empty_buckets_shapes(setup):
    docs, eng, srv, _ = setup
    aggs = {"r": {"range": {"field": "price", "ranges": []}},
            "t": {"terms": {"field": "site"}}}
    hits = eng.candidates({"match_all": {}}).select("doc_id")
    want = compile_aggregations(aggs, docs, hits)
    _, _, got = srv.search_with_aggs({"match_all": {}}, aggs, k=1)
    assert got == want
    assert want["r"] == {"buckets": []}


def test_can_aggregate_gates(setup):
    _, _, srv, _ = setup
    assert srv.can_aggregate(AGGS)
    # nested is Spark-only
    assert not srv.can_aggregate(
        {"n": {"nested": {"path": "meta"},
               "aggs": {"a": {"terms": {"field": "meta.author"}}}}})
    # unknown field
    assert not srv.can_aggregate({"x": {"terms": {"field": "nope"}}})
    # terms on a float field would render keys differently across engines
    assert not srv.can_aggregate({"x": {"terms": {"field": "price"}}})
    # match filter needs a string kind
    assert not srv.can_aggregate(
        {"x": {"filter": {"match": {"field": "qty", "value": "3"}}}})
    # date_histogram needs a ms kind
    assert not srv.can_aggregate(
        {"x": {"date_histogram": {"field": "qty", "interval": "1d"}}})
    # histogram over a servable numeric is fine
    assert srv.can_aggregate(
        {"x": {"histogram": {"field": "qty", "interval": 2}}})


def test_nested_agg_spark_path(spark):
    rows = [(i, STATUSES[i % 3],
             {"author": f"a{i % 4}", "stars": i % 5})
            for i in range(40)]
    docs = spark.createDataFrame(
        rows, "doc_id long, status string, "
              "meta struct<author string, stars long>")
    aggs = {"m": {"nested": {"path": "meta"},
                  "aggs": {"authors": {"terms": {"field": "meta.author",
                                                 "size": 2}}}}}
    got = compile_aggregations(aggs, docs, None)
    from collections import Counter
    c = Counter(f"a{i % 4}" for i in range(40))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert got == {"m": {"doc_count": 40, "authors": {"buckets": [
        {"key": k, "doc_count": n} for k, n in top]}}}


def test_stale_doc_values_refused(setup, spark, tmp_path):
    """LSM runs appended after the sidecar was written → serving refuses
    aggregations (can_aggregate False) instead of undercounting."""
    ixdir = str(tmp_path / "ix2")
    docs = spark.createDataFrame([_row(i) for i in range(30)], SCHEMA)
    cfg = IndexConfig(id_col="doc_id",
                      fields={"name": "text", "status": "keyword"},
                      n_buckets=4)
    write_index(docs, ixdir, cfg)
    idx = load_index(spark, ixdir)
    m = write_blocks(idx, ixdir)
    write_doc_values(docs, ixdir, ["site", "qty"],
                     includes_runs=m["includes_runs"])
    srv = ServingIndex(ixdir)
    assert srv.can_aggregate({"q": {"terms": {"field": "site"}}})
    from search_engine_spark.operators.lsm import append_docs
    extra = spark.createDataFrame([_row(i) for i in range(30, 36)], SCHEMA)
    append_docs(extra, ixdir, cfg)
    stale = ServingIndex(ixdir, allow_stale=True)
    assert not stale.can_aggregate({"q": {"terms": {"field": "site"}}})


def test_doc_values_frame_roundtrip(setup, spark):
    docs, _, _, ixdir = setup
    dv = doc_values_frame(spark, ixdir)
    assert dv.count() == N
    # ms column stores unix_millis of the timestamp
    from pyspark.sql import functions as F
    want = docs.select("doc_id",
                       F.unix_millis(F.col("ts")).alias("ts"))
    assert (dv.select("doc_id", "ts").exceptAll(want).count() == 0)


# -- docs-table operators served off the sidecar ---------------------------

DOCS_QUERIES = [
    {"range": {"field": "price", "gte": 20, "lt": 70}},
    {"range": {"field": "qty", "gte": 5, "lte": 9}},
    {"range": {"field": "site", "gte": "s2"}},     # str lexicographic
    {"range": {"field": "doc_id", "gte": 30, "lt": 90}},  # the id column
    {"exists": {"field": "doc_id"}},
    {"exists": {"field": "price"}},
    {"exists": {"field": "site"}},
    {"exists": {"field": "location.lat"}},
    {"geo_distance": {"field": "location", "distance": "120km",
                      "location": {"lat": 50.0, "lon": 8.0}}},
    {"geo_distance": {"field": "location", "distance": 45,
                      "center": [50.0, 8.0]}},     # km number + list form
    {"bool": {"must": [{"term": {"field": "status", "value": "active"}}],
              "filter": [{"range": {"field": "qty", "lte": 6}}]}},
    {"bool": {"should": [{"range": {"field": "price", "gte": 90}},
                         {"term": {"field": "site", "value": "s1"}}]}},
    {"bool": {"must": [{"exists": {"field": "site"}}],
              "must_not": [{"range": {"field": "qty", "lt": 3}}]}},
]


@pytest.mark.parametrize("qi", range(len(DOCS_QUERIES)))
def test_docs_table_ops_match_dsl(setup, qi):
    """range/exists/geo_distance — the docs-table operators — served off
    the doc-values sidecar, result-identical to the Spark DSL path, alone
    and composed under bool."""
    docs, eng, srv, _ = setup
    q = DOCS_QUERIES[qi]
    want = [(r["doc_id"], r["score"])
            for r in eng.search(q, size=200).collect()]
    got = srv.search(q, k=200, use_cache=False)
    assert [d for d, _ in got] == [d for d, _ in want], q
    assert want, q  # non-trivial
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12, abs=1e-15), (q, gd)


def test_docs_table_fallbacks(setup):
    _, _, srv, _ = setup
    # timestamp range: Spark's string->timestamp coercion stays Spark-side
    with pytest.raises(ValueError, match="serving surface"):
        srv.search({"range": {"field": "ts", "gte": "2025-01-02"}}, k=5)
    # field the sidecar does not carry
    with pytest.raises(ValueError, match="serving surface"):
        srv.search({"exists": {"field": "nope"}}, k=5)
    # mixed-type bound (numeric vs string column): Spark's implicit casts
    # own the answer — the fast path must defer, not diverge
    with pytest.raises(ValueError, match="serving surface"):
        srv.search({"range": {"field": "site", "gte": 3}}, k=5,
                   use_cache=False)
    # unknown fields on the SPARK path: no-match, never an
    # AnalysisException (builder semantics, like exists)
    _, eng, _, _ = setup
    assert eng.search({"range": {"field": "nope", "gte": 1}},
                      size=5).collect() == []
    assert eng.search({"geo_distance": {"field": "nope", "distance": "5km",
                                        "location": {"lat": 0, "lon": 0}}},
                      size=5).collect() == []


def test_docs_table_ops_respect_deletes(spark, tmp_path):
    """Tombstoned docs must stop matching PURE docs-table queries on both
    paths (the reference physically removes docs; dsl._live anti-join /
    serving _dv_docs_where intersection)."""
    from search_engine_spark.operators.delete import (
        delete_docs, load_index_with_deletes)
    ixdir = str(tmp_path / "ix")
    docs = spark.createDataFrame([_row(i) for i in range(40)], SCHEMA)
    cfg = IndexConfig(id_col="doc_id",
                      fields={"name": "text", "status": "keyword"},
                      n_buckets=4)
    write_index(docs, ixdir, cfg)
    m = write_blocks(load_index(spark, ixdir), ixdir)
    write_doc_values(docs, ixdir,
                     servable_fields(docs, "doc_id",
                                     exclude=("name", "content")),
                     includes_runs=m["includes_runs"])
    dead = [4, 9, 14]
    delete_docs(spark, ixdir, dead)
    eng = SparkSearchEngine(load_index_with_deletes(spark, ixdir), docs)
    q = {"range": {"field": "qty", "gte": 0}}  # matches everything alive
    spark_ids = [r["doc_id"] for r in eng.search(q, size=100).collect()]
    assert spark_ids and not set(dead) & set(spark_ids)
    srv = ServingIndex(ixdir)  # deletes bind at construction
    got = [d for d, _ in srv.search(q, k=100)]
    assert got == spark_ids
    # exists + geo also exclude the tombstones
    for q2 in ({"exists": {"field": "site"}},
               {"geo_distance": {"field": "location", "distance": "500km",
                                 "location": {"lat": 50.0, "lon": 8.0}}}):
        w = [r["doc_id"] for r in eng.search(q2, size=100).collect()]
        g = [d for d, _ in srv.search(q2, k=100)]
        assert g == w and not set(dead) & set(g), q2


def test_date_histogram_boundary_exact(spark):
    """Bucket boundaries are exact integer math on both engines: an event
    1 ms before midnight stays in the previous day; 1 ms after starts the
    next (and pre-1970 floors toward -inf, not toward 0)."""
    day = 86_400_000
    rows = [(0, dt.datetime(2025, 3, 9, 23, 59, 59, 999000)),
            (1, dt.datetime(2025, 3, 10, 0, 0, 0, 0)),
            (2, dt.datetime(2025, 3, 10, 0, 0, 0, 1000)),
            (3, dt.datetime(1969, 12, 31, 23, 0, 0, 0))]  # pre-epoch
    docs = spark.createDataFrame(rows, "doc_id long, ts timestamp")
    got = compile_aggregations(
        {"d": {"date_histogram": {"field": "ts", "interval": "1d"}}},
        docs, None)
    keys = {b["key"]: b["doc_count"] for b in got["d"]["buckets"]}
    assert keys == {"1969-12-31T00:00:00.000Z": 1,
                    "2025-03-09T00:00:00.000Z": 1,
                    "2025-03-10T00:00:00.000Z": 2}


def test_enrich_rows_string_ids(spark):
    """Spark-path hit enrichment works for string-id corpora (only the
    serving artifacts require numeric ids)."""
    from search_engine_spark.operators.doc_values import enrich_rows
    docs = spark.createDataFrame(
        [("d1", "en", 5), ("d2", "fr", 7)], "id string, lang string, n long")
    got = enrich_rows(docs, "id", ["d2", "d1"], ["lang", "n"])
    assert got == {"d1": {"lang": "en", "n": 5},
                   "d2": {"lang": "fr", "n": 7}}


def test_random_agg_configs_parity(setup):
    """Randomized agg configs (terms/histogram/date_histogram/range/
    filter+sub/global+sub over every dv kind) × random query scopes:
    serving.aggregate must equal the Spark compiler EXACTLY, config after
    config — the dict-equality analog of the query fuzz."""
    import random
    docs, eng, srv, _ = setup
    rng = random.Random(0xA66)

    def rnd_terms():
        return {"terms": {"field": rng.choice(["site", "qty", "flag",
                                               "status"]),
                          "size": rng.choice([1, 2, 3, 5, 10])}}

    def rnd_leaf():
        roll = rng.random()
        if roll < 0.3:
            return rnd_terms()
        if roll < 0.45:
            return {"histogram": {"field": rng.choice(["price", "qty"]),
                                  "interval": rng.choice([2, 5, 25, 40])}}
        if roll < 0.6:
            return {"date_histogram": {"field": "ts",
                                       "interval": rng.choice(
                                           ["1h", "1d", "1w", "1M"])}}
        lo, hi = sorted(rng.sample(range(0, 110), 2))
        return {"range": {"field": rng.choice(["price", "qty"]),
                          "ranges": [{"to": lo},
                                     {"from": lo, "to": hi, "key": "mid"},
                                     {"from": hi}]}}

    def rnd_agg():
        roll = rng.random()
        if roll < 0.6:
            return rnd_leaf()
        if roll < 0.8:
            flt = rng.choice([
                {"term": {"field": "site", "value": f"s{rng.randint(0, 5)}"}},
                {"match": {"field": "site", "value": rng.choice(
                    ["S1", "s2", "zz"])}},
                {"range": {"field": "price",
                           "gte": rng.randint(0, 50),
                           "lt": rng.randint(51, 110)}}])
            return {"filter": flt, "aggs": {"sub": rnd_terms()}}
        return {"global": {"aggs": {"sub": rnd_leaf()}}}

    scopes = [QUERY, {"match_all": {}},
              {"term": {"field": "status", "value": "pending"}},
              {"term": {"field": "name", "value": "banana"}},
              {"term": {"field": "status", "value": "zzznope"}}]
    for it in range(25):
        aggs = {f"a{j}": rnd_agg() for j in range(rng.randint(1, 4))}
        q = rng.choice(scopes)
        assert srv.can_aggregate(aggs), aggs
        hits = eng.candidates(q).select("doc_id")
        want = compile_aggregations(aggs, docs, hits)
        _, _, got = srv.search_with_aggs(q, aggs, k=5, use_cache=False)
        assert got == want, (it, q, aggs)


def test_nan_values_excluded_on_both_paths(spark, tmp_path):
    """A literal NaN in a double column must not produce a NaN bucket
    (unserializable in strict JSON) nor a serving/Spark disagreement —
    both paths exclude it like JS's always-false NaN comparisons."""
    rows = [(0, "active", 10.0), (1, "active", float("nan")),
            (2, "active", 30.0), (3, "active", None)]
    docs = spark.createDataFrame(rows, "doc_id long, st string, p double")
    aggs = {"h": {"histogram": {"field": "p", "interval": 20}},
            "r": {"range": {"field": "p", "ranges": [{"to": 100}]}}}
    got = compile_aggregations(aggs, docs, None)
    assert got["h"] == {"buckets": [{"key": 0, "doc_count": 1},
                                    {"key": 20, "doc_count": 1}]}
    assert got["r"]["buckets"][0]["doc_count"] == 2
    # serving twin agrees
    ixdir = str(tmp_path / "ix")
    cfg = IndexConfig(id_col="doc_id", fields={"st": "keyword"}, n_buckets=2)
    write_index(docs, ixdir, cfg)
    m = write_blocks(load_index(spark, ixdir), ixdir)
    write_doc_values(docs, ixdir, ["p"], includes_runs=m["includes_runs"])
    srv = ServingIndex(ixdir)
    _, _, got2 = srv.search_with_aggs({"match_all": {}}, aggs, k=1)
    assert got2 == got
