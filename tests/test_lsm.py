"""LSM incremental adds (operators/lsm): O(batch) appends, query over
base ∪ runs with NO merge, bucket-scoped compaction, delete interplay,
replay idempotency, and the REST documents/flush/snapshot endpoints."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import (META, POSTINGS,
                                                       IndexConfig,
                                                       build_index,
                                                       load_index,
                                                       write_index)
from search_engine_spark.operators.lsm import (append_docs, compact_runs,
                                               live_runs, write_run)
from search_engine_spark.plans.dsl import SparkSearchEngine

CFG = dict(id_col="doc_id", fields={"text": "text"}, n_buckets=8)


def _docs(spark, n=40):
    rows = [(i, f"alpha doc{i % 7} beta" + (" gamma" if i % 3 == 0 else ""),
             "en") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _bucket_dirs(ixdir):
    base = os.path.join(ixdir, POSTINGS)
    out = {}
    for name in os.listdir(base):
        if name.startswith("bucket="):
            d = os.path.join(base, name)
            out[name] = sorted(
                (f, os.path.getmtime(os.path.join(d, f)),
                 os.path.getsize(os.path.join(d, f)))
                for f in os.listdir(d) if f.endswith(".parquet"))
    return out


class TestAppendServesWithoutMerge:
    @pytest.fixture(scope="class")
    def built(self, spark, tmp_path_factory):
        ixdir = str(tmp_path_factory.mktemp("lsm") / "ix")
        docs = _docs(spark)
        base = docs.where(F.col("doc_id") % 5 != 0)
        rest = docs.where(F.col("doc_id") % 5 == 0)
        write_index(base, ixdir, IndexConfig(**CFG))
        append_docs(rest, ixdir, IndexConfig(**CFG))
        return ixdir, docs

    def test_membership_includes_appended(self, spark, built):
        ixdir, docs = built
        idx = load_index(spark, ixdir)
        eng = SparkSearchEngine(idx, docs)
        got = sorted(r["doc_id"] for r in eng.candidates(
            {"term": {"field": "text", "value": "gamma"}}).collect())
        want = sorted(r["doc_id"] for r in docs
                      .where(F.col("text").contains("gamma")).collect())
        assert got == want

    def test_meta_stats_exact_vs_full_build(self, spark, built,
                                            tmp_path_factory):
        ixdir, docs = built
        full_dir = str(tmp_path_factory.mktemp("lsm") / "full")
        full_meta = write_index(docs, full_dir, IndexConfig(**CFG))
        with open(os.path.join(ixdir, META)) as fh:
            meta = json.load(fh)
        assert meta["total_docs"] == full_meta["total_docs"]
        assert meta["dl_sum"] == full_meta["dl_sum"]
        assert meta["avg_dl"] == full_meta["avg_dl"]  # bitwise

    def test_scores_match_full_build(self, spark, built):
        ixdir, docs = built
        idx = load_index(spark, ixdir)
        eng = SparkSearchEngine(idx, docs)
        ref = SparkSearchEngine(build_index(docs, IndexConfig(**CFG)), docs)
        q = {"match": {"field": "text", "value": "gamma"}}
        got = [(r["doc_id"], r["score"])
               for r in eng.search(q, size=10).collect()]
        want = [(r["doc_id"], r["score"])
                for r in ref.search(q, size=10).collect()]
        assert got == want  # bitwise — additive stats == recomputed stats

    def test_compaction_touches_only_affected_buckets(self, spark, built):
        ixdir, docs = built
        before_runs = live_runs(ixdir)
        assert before_runs
        run_buckets = set()
        from search_engine_spark.operators.index_build import bucket_of
        for e in before_runs:
            p = spark.read.parquet(e["run_path"])
            for r in p.select("field", "term").distinct().collect():
                run_buckets.add(bucket_of(r["field"], r["term"], 8))
        before = _bucket_dirs(ixdir)
        eng_before = SparkSearchEngine(load_index(spark, ixdir), docs)
        q = {"term": {"field": "text", "value": "gamma"}}
        res_before = sorted(r["doc_id"]
                            for r in eng_before.candidates(q).collect())
        compact_runs(spark, ixdir)
        assert not live_runs(ixdir)
        after = _bucket_dirs(ixdir)
        untouched = set(before) - {f"bucket={b}" for b in run_buckets}
        for name in untouched:
            assert after[name] == before[name], f"{name} was rewritten"
        eng_after = SparkSearchEngine(load_index(spark, ixdir), docs)
        assert sorted(r["doc_id"]
                      for r in eng_after.candidates(q).collect()) == res_before


class TestReplayIdempotent:
    def test_same_run_key_applies_once(self, spark, tmp_path):
        ixdir = str(tmp_path / "ix")
        docs = _docs(spark, 10)
        write_index(docs.where(F.col("doc_id") < 5), ixdir, IndexConfig(**CFG))
        batch = docs.where(F.col("doc_id") >= 5)
        for _ in range(2):  # foreachBatch replay: same key, same paths
            write_run(batch, ixdir, IndexConfig(**CFG),
                      run_key="stream_batch=0",
                      manifest_name="stream-00000.json",
                      lineage={"source": "stream", "batch_id": 0})
        with open(os.path.join(ixdir, META)) as fh:
            meta = json.load(fh)
        assert meta["total_docs"] == 10
        assert meta["applied_runs"] == ["stream_batch=0"]


class TestDeleteInterplay:
    def test_delete_sees_appended_docs(self, spark, tmp_path):
        from search_engine_spark.operators.delete import (
            compact_deletes, delete_docs, load_index_with_deletes)
        ixdir = str(tmp_path / "ix")
        docs = _docs(spark, 20)
        write_index(docs.where(F.col("doc_id") < 10), ixdir,
                    IndexConfig(**CFG))
        append_docs(docs.where(F.col("doc_id") >= 10), ixdir,
                    IndexConfig(**CFG))
        delete_docs(spark, ixdir, [3, 15])  # one base doc, one appended doc
        idx = load_index_with_deletes(spark, ixdir)
        eng = SparkSearchEngine(idx, docs)
        got = sorted(r["doc_id"] for r in eng.candidates(
            {"term": {"field": "text", "value": "alpha"}}).collect())
        assert 3 not in got and 15 not in got
        assert 14 in got and 19 in got
        # physical compaction folds runs first, then applies tombstones —
        # the appended-but-deleted doc must NOT resurface
        compact_deletes(spark, ixdir)
        idx2 = load_index(spark, ixdir)
        eng2 = SparkSearchEngine(idx2, docs)
        got2 = sorted(r["doc_id"] for r in eng2.candidates(
            {"term": {"field": "text", "value": "alpha"}}).collect())
        assert got2 == got


class TestBlockSnapshotStaleness:
    def test_serving_refuses_stale_blocks(self, spark, tmp_path):
        from search_engine_spark.operators.wand import (load_blocks,
                                                        write_blocks)
        from search_engine_spark.serving import ServingIndex
        docs = _docs(spark, 30)
        ixdir = str(tmp_path / "ix")
        write_index(docs.where(F.col("doc_id") < 20), ixdir,
                    IndexConfig(**CFG))
        write_blocks(load_index(spark, ixdir), ixdir)
        ServingIndex(ixdir)  # fresh: fine
        append_docs(docs.where(F.col("doc_id") >= 20), ixdir,
                    IndexConfig(**CFG))
        # blocks now silently lack docs 20-29 — readers must refuse
        with pytest.raises(ValueError, match="STALE"):
            ServingIndex(ixdir)
        with pytest.raises(ValueError, match="STALE"):
            load_blocks(spark, ixdir)
        # explicit opt-in serves the old snapshot
        srv = ServingIndex(ixdir, allow_stale=True)
        assert srv.postings("text", "alpha")[0].size > 0
        # rebuilding blocks over the base ∪ runs handle covers the runs
        write_blocks(load_index(spark, ixdir), ixdir)
        srv = ServingIndex(ixdir)
        assert 25 in srv.postings("text", "alpha")[0].tolist()
        # compaction after the rebuild keeps the snapshot fresh
        compact_runs(spark, ixdir)
        ServingIndex(ixdir)
        load_blocks(spark, ixdir)

    def test_compaction_cannot_unstale_blocks(self, spark, tmp_path):
        # the guard compares against committed AND compacted runs:
        # append → compact (e.g. the server's /flush) with NO blocks
        # rebuild must stay STALE — the snapshot still lacks those docs
        from search_engine_spark.operators.wand import write_blocks
        from search_engine_spark.serving import ServingIndex
        docs = _docs(spark, 30)
        ixdir = str(tmp_path / "ix")
        write_index(docs.where(F.col("doc_id") < 20), ixdir,
                    IndexConfig(**CFG))
        write_blocks(load_index(spark, ixdir), ixdir)
        append_docs(docs.where(F.col("doc_id") >= 20), ixdir,
                    IndexConfig(**CFG))
        compact_runs(spark, ixdir)
        with pytest.raises(ValueError, match="STALE"):
            ServingIndex(ixdir)

    def test_unstamped_handle_claims_no_runs(self, spark, tmp_path):
        # write_blocks from an in-session build_index handle (no lineage
        # stamp) into a dir holding runs must record NO coverage — the
        # handle never unioned those runs, so the snapshot stays STALE
        from search_engine_spark.operators.wand import write_blocks
        from search_engine_spark.serving import ServingIndex
        docs = _docs(spark, 30)
        ixdir = str(tmp_path / "ix")
        write_index(docs.where(F.col("doc_id") < 20), ixdir,
                    IndexConfig(**CFG))
        append_docs(docs.where(F.col("doc_id") >= 20), ixdir,
                    IndexConfig(**CFG))
        idx = build_index(docs.where(F.col("doc_id") < 20),
                          IndexConfig(**CFG))
        write_blocks(idx, ixdir)
        with pytest.raises(ValueError, match="STALE"):
            ServingIndex(ixdir)

    def test_compact_deletes_stales_blocks(self, spark, tmp_path):
        # physical delete compaction drops the tombstone table old
        # snapshots rely on to mask deleted docs — serving them would
        # resurrect the deletes, so the delete epoch must flag STALE
        from search_engine_spark.operators.delete import (
            compact_deletes, delete_docs)
        from search_engine_spark.operators.wand import write_blocks
        from search_engine_spark.serving import ServingIndex
        docs = _docs(spark, 30)
        ixdir = str(tmp_path / "ix")
        write_index(docs, ixdir, IndexConfig(**CFG))
        write_blocks(load_index(spark, ixdir), ixdir)
        delete_docs(spark, ixdir, [1, 2, 3])
        # tombstones present: snapshot is maskable, still servable
        srv = ServingIndex(ixdir)
        assert 1 not in srv.postings("text", "alpha")[0].tolist()
        compact_deletes(spark, ixdir)
        with pytest.raises(ValueError, match="compact_deletes"):
            ServingIndex(ixdir)
        # rebuilding over the compacted base restores freshness
        write_blocks(load_index(spark, ixdir), ixdir)
        srv = ServingIndex(ixdir)
        assert 1 not in srv.postings("text", "alpha")[0].tolist()


class TestStreamingQueryableWithoutMerge:
    def test_stream_runs_serve_before_merge(self, spark, tmp_path):
        from search_engine_spark.streaming.ingest import stream_index_runs
        docs = _docs(spark, 24)
        src_dir = str(tmp_path / "src")
        docs.repartition(3).write.parquet(src_dir)
        ixdir = str(tmp_path / "six")
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src_dir))
        q = stream_index_runs(stream, ixdir, IndexConfig(**CFG),
                              checkpoint_dir=str(tmp_path / "ckpt"))
        q.awaitTermination()
        # NO merge_stream_runs: load_index serves the committed runs
        idx = load_index(spark, ixdir)
        assert idx.total_docs == 24
        eng = SparkSearchEngine(idx, docs)
        got = sorted(r["doc_id"] for r in eng.candidates(
            {"term": {"field": "text", "value": "gamma"}}).collect())
        want = sorted(r["doc_id"] for r in docs
                      .where(F.col("text").contains("gamma")).collect())
        assert got == want


class TestRestEndpoints:
    @pytest.fixture()
    def service(self, spark, tmp_path):
        from search_engine_spark.server import SearchService
        docs = _docs(spark, 12)
        docs_path = str(tmp_path / "docs")
        docs.write.parquet(docs_path)
        svc = SearchService(spark, str(tmp_path / "root"))
        svc.create_index("idx", docs_path)
        return svc

    def test_add_documents_shapes(self, service):
        out = service.add_documents("idx", [
            {"doc_id": 100, "text": "alpha omega fresh", "lang": "en"},
            # existing id, CHANGED content -> replaced (reference add()
            # upserts, QueryEngine.ts:137-149)
            {"doc_id": 5, "text": "alpha dupe", "lang": "en"},
        ])
        assert out["addedCount"] == 2
        assert out["replacedCount"] == 1
        assert out["duplicateCount"] == 0
        assert out["totalDocs"] == 13
        assert out["persistence"]["enabled"] is True
        assert out["persistence"]["triggered"] is True  # addedCount > 0
        # the appended doc is immediately searchable
        res = service.search("idx", {"query": {
            "term": {"field": "text", "value": "omega"}}})
        assert [h["doc_id"] for h in res["hits"]] == [100]
        assert res["total"] == 1
        # the replaced doc serves its NEW content only
        res = service.search("idx", {"query": {
            "term": {"field": "text", "value": "dupe"}}})
        assert [h["doc_id"] for h in res["hits"]] == [5]

    def test_flush_shapes(self, service):
        service.add_documents("idx", [
            {"doc_id": 200, "text": "omega two", "lang": "en"}])
        ixdir = service.catalog._dir("idx")
        assert live_runs(ixdir)
        out = service.flush("idx")
        assert out["flushedWorkers"] == 1 and out["totalWorkers"] == 1
        assert not live_runs(ixdir)
        res = service.search("idx", {"query": {
            "term": {"field": "text", "value": "omega"}}})
        assert [h["doc_id"] for h in res["hits"]] == [200]

    def test_snapshot_shapes(self, service, spark):
        out = service.snapshot("idx")
        assert out["indexName"] == "idx" and out["timestamp"]
        from search_engine_spark.serving import ServingIndex
        srv = ServingIndex(service.catalog._dir("idx"))
        assert srv.topk("text", ["alpha"], k=3)

    def test_search_fast_path_lifecycle(self, service):
        q = {"query": {"term": {"field": "text", "value": "alpha"}}}
        # before any snapshot: Spark path
        spark_res = service.search("idx", q)
        assert "servedBy" not in spark_res["_performance"]
        # after /snapshot: the same query is answered off the blocks,
        # result-identical (rel 1e-12 — JVM ln vs libm log)
        service.snapshot("idx")
        fast = service.search("idx", q)
        assert fast["_performance"]["servedBy"] == "blocks"
        assert [h["doc_id"] for h in fast["hits"]] == \
               [h["doc_id"] for h in spark_res["hits"]]
        assert fast["total"] == spark_res["total"]
        for a, b in zip(fast["hits"], spark_res["hits"]):
            assert a["score"] == pytest.approx(b["score"], rel=1e-12)
        assert service.performance()["served_by_blocks"] == 1
        # docs-table ops on sidecar-carried fields (the id column here)
        # serve off the snapshot too; fields the sidecar lacks fall back
        rng = service.search("idx", {"query": {
            "range": {"field": "doc_id", "gte": 0}}})
        assert rng["_performance"].get("servedBy") == "blocks"
        assert rng["total"] >= spark_res["total"] > 0
        missing = service.search("idx", {"query": {
            "exists": {"field": "not_a_column"}}})
        assert "servedBy" not in missing["_performance"]
        # an append makes the snapshot STALE: fall back to Spark (the
        # appended doc must be visible), then /snapshot re-enables
        service.add_documents("idx", [
            {"doc_id": 300, "text": "alpha late", "lang": "en"}])
        res = service.search("idx", q)
        assert "servedBy" not in res["_performance"]
        assert 300 in [h["doc_id"] for h in res["hits"]] or \
               res["total"] == spark_res["total"] + 1
        service.snapshot("idx")
        res2 = service.search("idx", q)
        assert res2["_performance"]["servedBy"] == "blocks"
        assert res2["total"] == spark_res["total"] + 1
