"""Regression: upsert-resolution purge that EMPTIES a posting bucket.

Dynamic partition overwrite only rewrites partitions present in the
output frame, so a bucket holding nothing but a resolved doc's old
vocabulary used to keep its stale partition dir through compact_runs —
and the tombstone shrink then unmasked those rows, resurrecting the
superseded generation (found by tools/soak_lifecycle.py seed 0).
compact_runs now removes extension-only buckets that end empty."""

from __future__ import annotations

import os

from search_engine_spark.functions.hashing import xxh64_str
from search_engine_spark.serving import ServingIndex


def _isolated_tokens(n_buckets: int, taken: set, count: int) -> list:
    """Token names whose buckets collide with nothing else in the test."""
    used = set(taken)
    out = []
    i = 0
    while len(out) < count:
        t = f"tok{i}"
        i += 1
        b = xxh64_str(t) % n_buckets
        if b in used:
            continue
        used.add(b)
        out.append(t)
    return out


def test_superseded_run_generation_bucket_rebuilt(spark, tmp_path):
    """A mid-generation that only ever lived in a RUN (doc upserted twice
    between flushes) is masked out of the fold by its barrier — but the
    blocks snapshot encoded it from the raw run parquet. compact_runs
    must include its buckets in affected/resolve_events so the refresh
    rebuilds them and drops the stale delta segments; otherwise the
    tombstone shrink unmasks the superseded generation (found by
    tools/soak_lifecycle.py seed 1)."""
    from search_engine_spark.server import SearchService
    nb = 32
    taken = {xxh64_str(t) % nb for t in ("alpha", "shared", "filler")}
    g1tok, g2tok = _isolated_tokens(nb, taken, 2)
    docs = spark.createDataFrame(
        [(0, "alpha shared filler", "en"),
         (1, "alpha shared filler", "en")],
        "doc_id long, text string, lang string")
    dp = str(tmp_path / "docs")
    docs.write.parquet(dp)
    svc = SearchService(spark, str(tmp_path / "ix"))
    svc.create_index("r", dp, fields={"text": "text"})
    ixdir = svc.catalog._dir("r")
    svc.snapshot("r")

    # gen 1: private token g1tok, snapshotted as a run delta
    svc.add_documents("r", [{"doc_id": 0,
                             "text": f"alpha shared {g1tok}",
                             "lang": "en"}])
    svc.snapshot("r")
    # gen 2 supersedes gen 1 BEFORE any flush; then fold + refresh
    svc.add_documents("r", [{"doc_id": 0,
                             "text": f"alpha shared {g2tok}",
                             "lang": "en"}])
    svc.flush("r")
    svc.snapshot("r")

    for q, want_total, want_doc in ((g1tok, 0, None), (g2tok, 1, 0)):
        res = svc.search("r", {"query": {"term": {
            "field": "text", "value": q}}, "size": 5})
        assert res["total"] == want_total, (q, res)
        if want_doc is not None:
            assert res["hits"][0]["doc_id"] == want_doc
    srv = ServingIndex(ixdir)
    _, tot = srv.search_with_total({"term": {"field": "text",
                                             "value": g1tok}}, k=5)
    assert tot == 0, "superseded run generation resurrected in blocks"
    _, tot = srv.search_with_total({"match_all": {}}, k=5)
    assert tot == 2


def test_upsert_emptying_bucket_purges_old_generation(spark, tmp_path):
    from search_engine_spark.server import SearchService
    nb = 32  # create_index default bucket count
    taken = {xxh64_str(t) % nb for t in ("alpha", "shared", "filler")}
    oldtok, newtok = _isolated_tokens(nb, taken, 2)
    docs = spark.createDataFrame(
        [(0, f"alpha shared {oldtok}", "en"),
         (1, "alpha shared filler", "en")],
        "doc_id long, text string, lang string")
    dp = str(tmp_path / "docs")
    docs.write.parquet(dp)
    svc = SearchService(spark, str(tmp_path / "ix"))
    svc.create_index("r", dp, fields={"text": "text"})
    ixdir = svc.catalog._dir("r")
    svc.snapshot("r")

    # upsert doc 0: its ONLY private token moves oldtok -> newtok, so
    # oldtok's bucket holds nothing after the resolution purge
    svc.add_documents("r", [{"doc_id": 0,
                             "text": f"alpha shared {newtok}",
                             "lang": "en"}])
    svc.flush("r")

    # the emptied bucket's partition dir must be gone (not a stale file)
    b_old = xxh64_str(oldtok) % nb
    assert not os.path.isdir(
        os.path.join(ixdir, "postings", f"bucket={b_old}"))

    res = svc.search("r", {"query": {"term": {
        "field": "text", "value": oldtok}}, "size": 5})
    assert res["total"] == 0, "superseded generation resurrected"
    res = svc.search("r", {"query": {"term": {
        "field": "text", "value": newtok}}, "size": 5})
    assert res["total"] == 1 and res["hits"][0]["doc_id"] == 0

    # the serving snapshot rebuilds the emptied bucket to empty too
    svc.snapshot("r")
    srv = ServingIndex(ixdir)
    _, tot = srv.search_with_total({"term": {"field": "text",
                                             "value": oldtok}}, k=5)
    assert tot == 0
    _, tot = srv.search_with_total({"match_all": {}}, k=5)
    assert tot == 2
