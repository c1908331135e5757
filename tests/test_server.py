"""HTTP facade: endpoint shapes, clamps, 404s (server.ts parity)."""

import json
import threading
import urllib.request

import pytest

from search_engine_spark.server import (MAX_AGG_TERMS, MAX_FROM, MAX_SIZE,
                                        SearchService, clamp_options,
                                        make_server)
from search_engine_spark.sources.synth import synth_pages


def test_clamp_options():
    o = clamp_options({"size": 5000, "from": 99999, "aggregations": {
        "langs": {"terms": {"field": "lang", "size": 500}}}})
    assert o["size"] == MAX_SIZE and o["from"] == MAX_FROM
    assert o["aggregations"]["langs"]["terms"]["size"] == MAX_AGG_TERMS
    d = clamp_options({})
    assert d == {"size": 10, "from": 0, "aggregations": {}}


@pytest.fixture(scope="module")
def served(tmp_path_factory, spark):
    root = str(tmp_path_factory.mktemp("srv_root"))
    pages_dir = str(tmp_path_factory.mktemp("srv_pages") / "pages")
    pages = synth_pages(spark, 120).cache()
    pages.write.parquet(pages_dir)
    svc = SearchService(spark, root)
    httpd = make_server(svc)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, pages_dir
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def test_server_end_to_end(served):
    base, pages_dir = served
    code, health = _get(base + "/")
    assert code == 200 and health["status"] == "ok"

    code, out = _post(base + "/index", {
        "indexName": "web", "docsPath": pages_dir,
        "fields": {"text": "text"}})
    assert code == 200 and out["meta"]["total_docs"] == 120

    code, res = _post(base + "/search/web", {
        "query": {"match": {"field": "text", "value": "za"}},
        "size": 5,
        "aggregations": {"langs": {"terms": {"field": "lang", "size": 3}}}})
    assert code == 200
    assert len(res["hits"]) <= 5 and res["total"] >= len(res["hits"])
    assert res["hits"] == sorted(
        res["hits"], key=lambda h: (-h["score"], h["doc_id"]))
    assert len(res["aggregations"]["langs"]["buckets"]) <= 3

    # clamps applied server-side
    code, res = _post(base + "/search/web", {"size": 5000})
    assert code == 200 and res["size"] == 100

    # unknown index -> 404 (server.ts:258-261)
    code, res = _post(base + "/search/nope", {})
    assert code == 404 and "not found" in res["error"]

    code, _ = _get(base + "/performance")
    assert code == 200


def test_aggregations_fast_path_matches_spark(served):
    """After /snapshot the whole search+aggs request is served off the
    block snapshot + doc-values sidecar (servedBy blocks), byte-identical
    to the Spark path's response (hits, total, every agg bucket)."""
    base, pages_dir = served
    _post(base + "/index", {"indexName": "webagg", "docsPath": pages_dir,
                            "fields": {"text": "text"}})
    body = {
        "query": {"match": {"field": "text", "value": "za"}},
        "size": 5,
        "aggregations": {
            "langs": {"terms": {"field": "lang", "size": 3}},
            "by_day": {"date_histogram": {"field": "warc_ts",
                                          "interval": "1d"}},
            "en_only": {"filter": {"term": {"field": "lang",
                                            "value": "en"}},
                        "aggs": {"langs": {"terms": {"field": "lang"}}}},
            "all": {"global": {"aggs": {
                "langs": {"terms": {"field": "lang", "size": 5}}}}},
        },
    }
    code, spark_res = _post(base + "/search/webagg", body)
    assert code == 200 and "servedBy" not in spark_res["_performance"]
    assert spark_res["aggregations"]["all"]["doc_count"] == 120

    code, snap = _post(base + "/index/webagg/snapshot", {})
    assert code == 200
    assert "lang" in snap["metrics"]["doc_values_fields"]

    code, fast_res = _post(base + "/search/webagg", body)
    assert code == 200
    assert fast_res["_performance"].get("servedBy") == "blocks"
    assert fast_res["hits"] == spark_res["hits"]
    assert fast_res["total"] == spark_res["total"]
    assert fast_res["aggregations"] == spark_res["aggregations"]

    # docs-table operator (range on the id column) + aggs: ALSO served
    # off the sidecar — the whole request answers without a Spark job,
    # and the buckets stay hit-scoped and consistent with the total
    code, res = _post(base + "/search/webagg", {
        "query": {"range": {"field": "doc_id", "gte": 0, "lte": 50}},
        "aggregations": {"langs": {"terms": {"field": "lang"}}}})
    assert code == 200
    assert res["_performance"].get("servedBy") == "blocks"
    assert res["total"] == 51
    assert sum(b["doc_count"] for b in
               res["aggregations"]["langs"]["buckets"]) == res["total"]
    # a docs-table field the sidecar cannot serve (binary html) falls back
    code, res = _post(base + "/search/webagg", {
        "query": {"exists": {"field": "html"}}})
    assert code == 200 and "servedBy" not in res["_performance"]


def test_facets_and_enriched_hits_parity(served):
    """facetFields at index creation → every response carries
    {field: {value: count}} facets over the matched set
    (FacetEngine.calculate, SearchEngine.ts:629-634), and hits spread the
    stored document (SearchEngine.ts:619-627) — identical on the Spark
    path and the snapshot fast path."""
    base, pages_dir = served
    _post(base + "/index", {"indexName": "webfac", "docsPath": pages_dir,
                            "fields": {"text": "text"},
                            "facetFields": ["lang"]})
    body = {"query": {"match": {"field": "text", "value": "za"}},
            "size": 4}
    code, spark_res = _post(base + "/search/webfac", body)
    assert code == 200 and "servedBy" not in spark_res["_performance"]
    # facets: every matched lang with its count, no size cap
    assert sum(spark_res["facets"]["lang"].values()) == spark_res["total"]
    # hits carry the stored document (scalar columns + text body)
    h0 = spark_res["hits"][0]
    assert {"doc_id", "score", "lang", "url", "warc_ts", "text"} <= set(h0)
    assert h0["warc_ts"].endswith("Z") and "T" in h0["warc_ts"]

    code, _ = _post(base + "/index/webfac/snapshot", {})
    assert code == 200
    code, fast_res = _post(base + "/search/webfac", body)
    assert code == 200
    assert fast_res["_performance"].get("servedBy") == "blocks"
    assert fast_res["hits"] == spark_res["hits"]
    assert fast_res["facets"] == spark_res["facets"]
    assert fast_res["total"] == spark_res["total"]


def test_agg_fast_path_survives_concurrent_snapshots(served):
    """Search+aggs+facets requests racing POST /snapshot rebuilds: every
    response must be 200 with the same totals and bucket sums, whichever
    path served it (a sidecar mid-rewrite falls back to Spark, never 500s
    or undercounts)."""
    import queue
    base, pages_dir = served
    _post(base + "/index", {"indexName": "webrace", "docsPath": pages_dir,
                            "fields": {"text": "text"},
                            "facetFields": ["lang"]})
    _post(base + "/index/webrace/snapshot", {})
    body = {"query": {"match": {"field": "text", "value": "za"}},
            "size": 3,
            "aggregations": {"langs": {"terms": {"field": "lang"}}}}
    want = _post(base + "/search/webrace", body)[1]
    errors: "queue.Queue" = queue.Queue()

    def worker(n):
        for _ in range(n):
            try:
                code, res = _post(base + "/search/webrace", body)
                if code != 200:
                    errors.put(("status", code))
                elif (res["total"] != want["total"]
                      or res["aggregations"]["langs"]["buckets"]
                      != want["aggregations"]["langs"]["buckets"]
                      or res["facets"] != want["facets"]):
                    errors.put(("mismatch", res["total"]))
            except Exception as e:  # noqa: BLE001
                errors.put(("exc", repr(e)))

    threads = [threading.Thread(target=worker, args=(12,))
               for _ in range(4)]
    for t in threads:
        t.start()
    for _ in range(2):  # racing rewrites of blocks + sidecar
        code, _ = _post(base + "/index/webrace/snapshot", {})
        assert code == 200
    for t in threads:
        t.join()
    assert errors.empty(), list(errors.queue)[:5]


def test_clamp_options_tolerates_non_dict_aggs():
    # JS Object.entries([]) is empty — a malformed aggregations body must
    # not 500 (clamp drops it)
    assert clamp_options({"aggregations": []})["aggregations"] == {}
    assert clamp_options({"aggregations": "x"})["aggregations"] == {}


def test_unknown_facet_field_never_500s(served):
    """A typo'd facetFields entry must yield empty facets, not a permanent
    500 on every search (reference FacetEngine: unknown field = empty)."""
    base, pages_dir = served
    _post(base + "/index", {"indexName": "webtypo", "docsPath": pages_dir,
                            "fields": {"text": "text"},
                            "facetFields": ["tpyo"]})
    code, res = _post(base + "/search/webtypo", {
        "query": {"match": {"field": "text", "value": "za"}},
        "aggregations": {"bad": {"terms": {"field": "also_missing"}},
                         "null_entry": None,
                         "ranges": {"range": {"field": "missing", "ranges": [
                             {"to": 5}]}}}})
    assert code == 200
    assert res["facets"] == {"tpyo": {}}
    assert res["aggregations"]["bad"] == {"buckets": []}
    assert res["aggregations"]["ranges"]["buckets"][0]["doc_count"] == 0
    assert "null_entry" not in res["aggregations"]


def test_malformed_bodies_never_500(served):
    """Fuzz the /search surface with malformed-but-parseable bodies: every
    response must be 200/400/404 — the clamps and schema guards absorb
    garbage like the reference's optimizeSearchOptions, never a 500."""
    base, pages_dir = served
    _post(base + "/index", {"indexName": "webfuzz", "docsPath": pages_dir,
                            "fields": {"text": "text"}})
    bodies = [
        {},
        {"query": None},
        {"query": {}},
        {"query": {"unknown_op": {"field": "text", "value": "x"}}},
        {"query": {"term": {}}},
        {"query": {"term": {"field": None, "value": None}}},
        {"query": {"match": {"field": "text"}}},
        {"query": {"bool": {}}},
        {"query": {"bool": {"must": {}, "should": None}}},
        {"query": {"range": {"field": "no_such_col", "gte": 1}}},
        {"query": {"range": {"field": "text"}}},
        {"query": {"exists": {}}},
        {"query": {"exists": {"field": "nope.deep.path"}}},
        {"query": {"geo_distance": {"field": "nope", "distance": "5km",
                                    "location": {"lat": 0, "lon": 0}}}},
        {"query": {"geo_distance": {"field": "text"}}},
        {"query": {"match_phrase": {"field": "text", "value": ""}}},
        {"size": -99, "from": -5},
        {"size": "12"},
        {"aggregations": []},
        {"aggregations": {"a": None, "b": 7, "c": "x"}},
        {"aggregations": {"a": {"terms": {}}}},
        {"aggregations": {"a": {"terms": {"field": "zzz", "size": -1}}}},
        {"aggregations": {"a": {"range": {"field": "zzz"}}}},
        {"aggregations": {"a": {"filter": {"term": {"field": "zzz",
                                                    "value": 1}}}}},
        {"aggregations": {"a": {"date_histogram": {"field": "lang",
                                                   "interval": "bogus"}}}},
        {"aggregations": {"a": {"global": {}}}},
        {"aggregations": {"a": {"nested": {"path": "zzz"}}}},
        {"query": {"bool": {"should": [],
                            "minimum_should_match": "nope"}}},
        {"size": "abc", "from": "xyz"},
        {"aggregations": {"a": {"terms": {"field": "lang",
                                          "size": "abc"}}}},
        {"aggregations": {"a": {"filter": {"range": {"field": "doc_id",
                                                     "gte": "cheap"}}}}},
        {"aggregations": {"a": {"histogram": {"field": "doc_id",
                                              "interval": "x"}}}},
        {"aggregations": {"a": {"range": {"field": "doc_id", "ranges": [
            {"to": "x"}, {"from": 5}]}}}},
    ]
    bad = []
    for b in bodies:
        code, res = _post(base + "/search/webfuzz", b)
        if code >= 500:
            bad.append((b, code, res))
    assert not bad, bad[:3]


def test_added_documents_visible_to_aggs_and_enrichment(served):
    """POST /documents rows must be full citizens: their FIELD VALUES
    count in aggregations/facets and enrich hits on the Spark path, and
    after /snapshot the fast path agrees (the reference's idx.documents
    holds the complete added doc, server.ts:353-385)."""
    base, pages_dir = served
    _post(base + "/index", {"indexName": "webadd", "docsPath": pages_dir,
                            "fields": {"text": "text"},
                            "facetFields": ["lang"]})
    code, res = _post(base + "/index/webadd/documents", {"documents": [
        {"doc_id": 9001, "text": "zzappended wordish", "lang": "xx",
         "url": "https://added.example/1"}]})
    assert code == 200 and res["addedCount"] == 1
    body = {"query": {"term": {"field": "text", "value": "zzappended"}},
            "aggregations": {"langs": {"terms": {"field": "lang"}}}}
    code, spark_res = _post(base + "/search/webadd", body)
    assert code == 200 and "servedBy" not in spark_res["_performance"]
    assert spark_res["total"] == 1
    h = spark_res["hits"][0]
    assert h["doc_id"] == 9001 and h["lang"] == "xx"
    assert h["url"] == "https://added.example/1"
    assert spark_res["aggregations"]["langs"]["buckets"] == [
        {"key": "xx", "doc_count": 1}]
    assert spark_res["facets"]["lang"] == {"xx": 1}
    # snapshot → the fast path serves the same answer
    code, _ = _post(base + "/index/webadd/snapshot", {})
    assert code == 200
    code, fast = _post(base + "/search/webadd", body)
    assert code == 200
    assert fast["_performance"].get("servedBy") == "blocks"
    assert fast["total"] == spark_res["total"]
    assert fast["aggregations"] == spark_res["aggregations"]
    assert fast["facets"] == spark_res["facets"]
    assert fast["hits"][0]["lang"] == "xx"


def test_keyed_index_over_http(tmp_path, spark):
    """String-keyed lifecycle through the facade (reference accepts any
    id type): create with keyCol=url, POST a re-crawl + a new url, search
    — and a RESTARTED service restores the keyed docs view."""
    import os

    root = str(tmp_path / "kroot")
    pages_dir = str(tmp_path / "kpages")
    spark.createDataFrame(
        [(f"https://k.test/{i}", f"alpha body{i} common") for i in range(25)],
        "url string, text string").write.parquet(pages_dir)
    svc = SearchService(spark, root)
    httpd = make_server(svc)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        code, out = _post(base + "/index", {
            "indexName": "keyed", "docsPath": pages_dir,
            "fields": {"text": "text"}, "keyCol": "url"})
        assert code == 200 and out["meta"]["total_docs"] == 25

        code, out = _post(base + "/index/keyed/documents", {"documents": [
            {"url": "https://k.test/3", "text": "alpha freshcopy common"},
            {"url": "https://k.test/99", "text": "alpha newpage common"},
        ]})
        assert code == 200, out
        assert out["addedCount"] == 2 and out["replacedCount"] == 1
        assert out["totalDocs"] == 26

        code, out = _post(base + "/search/keyed", {
            "query": {"term": {"field": "text", "value": "freshcopy"}}})
        assert code == 200 and out["total"] == 1
        assert out["hits"][0]["url"] == "https://k.test/3"
        code, out = _post(base + "/search/keyed", {
            "query": {"term": {"field": "text", "value": "body3"}}})
        assert code == 200 and out["total"] == 0

        # byte-identical re-send of a keyed doc is dropped (CRDT dedup)
        code, out = _post(base + "/index/keyed/documents", {"documents": [
            {"url": "https://k.test/3", "text": "alpha freshcopy common"},
        ]})
        assert code == 200, out
        assert out["addedCount"] == 0 and out["duplicateCount"] == 1
        assert out["totalDocs"] == 26

        # snapshot -> the millisecond serving path serves the keyed
        # index and spreads the stored url on hits
        code, out = _post(base + "/index/keyed/snapshot", {})
        assert code == 200, out
        code, out = _post(base + "/search/keyed", {
            "query": {"term": {"field": "text", "value": "newpage"}}})
        assert code == 200 and out["total"] == 1
        assert out["hits"][0]["url"] == "https://k.test/99"

        # keymap chunk count is bounded by the snapshot's consolidation
        # cadence: post fresh-key batches past the threshold, snapshot,
        # and the per-batch chunks fold to one
        svc.auto_persist["consolidate_after"] = 3
        for i in range(3):
            code, out = _post(base + "/index/keyed/documents",
                              {"documents": [{
                                  "url": f"https://k.test/batch{i}",
                                  "text": "alpha filler common"}]})
            assert code == 200, out
        code, out = _post(base + "/index/keyed/snapshot", {})
        assert code == 200, out
        from search_engine_spark.operators.keymap import _chunks
        ixdir = svc.catalog._dir("keyed")
        assert len(_chunks(ixdir)) == 1
        # every key still resolves post-fold
        code, out = _post(base + "/search/keyed", {
            "query": {"term": {"field": "text", "value": "filler"}}})
        assert code == 200 and out["total"] == 3
    finally:
        httpd.shutdown()

    # restart: a fresh service over the same root restores the keyed
    # docs view (re-maps the raw parquet through the persisted keymap)
    svc2 = SearchService(spark, root)
    res = svc2.search("keyed", {
        "query": {"term": {"field": "text", "value": "common"}},
        "size": 40})
    assert res["total"] == 29  # 25 base + 1 new + 3 filler batches
    hit_urls = {h.get("url") for h in res["hits"]}
    assert "https://k.test/99" in hit_urls and len(hit_urls) == 29
