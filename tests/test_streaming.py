"""Streaming ingest: foreachBatch incremental runs must merge to an index
identical to the batch build; windowed agg matches the batch equivalent."""

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import (IndexConfig,
                                                       load_index,
                                                       write_index)
from search_engine_spark.sources.synth import PAGES_SCHEMA, synth_pages
from search_engine_spark.streaming.ingest import (merge_stream_runs,
                                                  stream_index_runs,
                                                  windowed_event_counts)

CFG = dict(id_col="doc_id", fields={"text": "text"}, n_buckets=4)


def test_stream_ingest_equals_batch_build(tmp_path, spark):
    src = str(tmp_path / "src")
    pages = synth_pages(spark, 300).cache()
    # two source files -> two (or more) micro-batches
    pages.where(F.col("doc_id") < 150).write.parquet(src + "/a")
    pages.where(F.col("doc_id") >= 150).write.parquet(src + "/b")

    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    idx_dir = str(tmp_path / "stream_ix")
    q = stream_index_runs(stream, idx_dir, IndexConfig(**CFG))
    q.awaitTermination(120)
    meta = merge_stream_runs(spark, idx_dir, IndexConfig(**CFG))
    assert meta["total_docs"] == 300

    batch_dir = str(tmp_path / "batch_ix")
    write_index(pages, batch_dir, IndexConfig(**CFG))

    a = load_index(spark, idx_dir)
    b = load_index(spark, batch_dir)
    sa = {tuple(r) for r in a.postings.select("field", "term", "doc_id", "tf").collect()}
    sb = {tuple(r) for r in b.postings.select("field", "term", "doc_id", "tf").collect()}
    assert sa == sb
    assert a.total_docs == b.total_docs
    assert abs(a.avg_dl - b.avg_dl) < 1e-12
    # manifest carries per-batch lineage
    mdir = os.path.join(idx_dir, "build_manifest")
    assert len(os.listdir(mdir)) >= 2


def test_windowed_event_counts_matches_batch(tmp_path, spark):
    src = str(tmp_path / "ev")
    ev = spark.createDataFrame(
        [(i, f"2024-01-01 {i % 5:02d}:{i % 60:02d}:00", "click" if i % 2 else "view")
         for i in range(200)],
        "event_id long, ts_s string, event_type string") \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("wincounts")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(str(r["bucket"]), r["event_type"]): r["doc_count"]
           for r in spark.sql("select * from wincounts").collect()}
    want = {(str(r["bucket"]), r["event_type"]): r["doc_count"]
            for r in ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"),
                                "event_type")
            .agg(F.count(F.lit(1)).alias("doc_count")).collect()}
    # append mode emits only watermark-closed windows; every emitted window
    # must match the batch count, and most windows should have been emitted
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_stateful_sessionize_stream(tmp_path, spark):
    """Custom stateful operator (applyInPandasWithState): sessions CLOSED by
    the stream (gap exceeded inside the data) must match the batch
    sessionizer's gap splits."""
    from search_engine_spark.streaming.sessionize import sessionize_stream

    src = str(tmp_path / "ev2")
    rows = []
    # user 1: three sessions (gaps of 2h); user 2: one long session
    for k in range(3):
        for j in range(4):
            rows.append((len(rows), f"2024-01-01 {3 * k:02d}:{j:02d}:00", 1))
    for j in range(10):
        rows.append((len(rows), f"2024-01-01 05:{j:02d}:00", 2))
    ev = spark.createDataFrame(rows, "event_id long, ts_s string, user_id long") \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = sessionize_stream(stream)
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], str(r["session_start"]), r["n_events"])
           for r in spark.sql("select * from sess").collect()}
    # sessions closed BY GAP inside the data must always be emitted; the
    # final open session per user is flushed by the processing-time timeout,
    # which may or may not fire before availableNow terminates
    must_have = {(1, "2024-01-01 00:00:00", 4), (1, "2024-01-01 03:00:00", 4)}
    may_have = must_have | {(1, "2024-01-01 06:00:00", 4),
                            (2, "2024-01-01 05:00:00", 10)}
    assert must_have <= got <= may_have


def test_stream_ingest_with_stemming_equals_batch(tmp_path, spark):
    """Index-time stemming (fixed lang AND content-detect) flows through
    the streaming run path identically to the batch build."""
    for mode in ("de", "detect"):
        src = str(tmp_path / f"src_{mode}")
        pages = synth_pages(spark, 120).cache()
        pages.where(F.col("doc_id") < 60).write.parquet(src + "/a")
        pages.where(F.col("doc_id") >= 60).write.parquet(src + "/b")
        cfg = dict(CFG, stem_lang=mode)
        stream = (spark.readStream.schema(PAGES_SCHEMA)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(src + "/*"))
        idx_dir = str(tmp_path / f"stream_ix_{mode}")
        q = stream_index_runs(stream, idx_dir, IndexConfig(**cfg))
        q.awaitTermination(120)
        merge_stream_runs(spark, idx_dir, IndexConfig(**cfg))

        batch_dir = str(tmp_path / f"batch_ix_{mode}")
        write_index(pages, batch_dir, IndexConfig(**cfg))
        a = load_index(spark, idx_dir)
        b = load_index(spark, batch_dir)
        sa = {tuple(r) for r in
              a.postings.select("field", "term", "doc_id", "tf").collect()}
        sb = {tuple(r) for r in
              b.postings.select("field", "term", "doc_id", "tf").collect()}
        assert sa == sb, mode
        assert abs(a.avg_dl - b.avg_dl) < 1e-12


def test_stream_upsert_replaces_recrawled_id(tmp_path, spark):
    """Re-crawl semantics (reference add() replaces, QueryEngine.ts:
    137-149): a streamed page whose id is already live tombstones the old
    generation; the batch's run out-survives the barrier. Totals, BM25
    inputs, and term membership must all reflect only the new version."""
    from search_engine_spark.operators.delete import load_index_with_deletes
    from search_engine_spark.plans.dsl import SparkSearchEngine

    src = str(tmp_path / "src")
    base = spark.createDataFrame(
        [(i, f"http://x/{i}", f"alpha shared body{i}", "en")
         for i in range(20)],
        "doc_id long, url string, text string, lang string")
    base.write.parquet(src + "/a")
    recrawl = spark.createDataFrame(
        [(3, "http://x/3", "alpha shared freshcopy", "en"),
         (100, "http://x/100", "alpha shared newdoc", "en")],
        "doc_id long, url string, text string, lang string")
    recrawl.write.parquet(src + "/b")

    stream = (spark.readStream.schema(base.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    idx_dir = str(tmp_path / "ix")
    q = stream_index_runs(stream, idx_dir, IndexConfig(**CFG))
    q.awaitTermination(120)

    docs_now = (base.join(recrawl.select("doc_id"), "doc_id", "anti")
                .unionByName(recrawl))
    idx = load_index_with_deletes(spark, idx_dir)
    assert idx.total_docs == 21  # 20 + 1 new, re-crawl replaced in place
    eng = SparkSearchEngine(idx, docs_now)
    got = {r["doc_id"] for r in eng.search(
        {"term": {"field": "text", "value": "freshcopy"}}, size=5).collect()}
    assert got == {3}
    assert eng.search({"term": {"field": "text", "value": "body3"}},
                      size=5).count() == 0
    # flush resolves the upsert physically; totals survive
    from search_engine_spark.operators.lsm import compact_runs
    compact_runs(spark, idx_dir)
    idx = load_index_with_deletes(spark, idx_dir)
    assert idx.total_docs == 21
    assert idx.doc_stats.select("doc_id").distinct().count() == 21
    eng = SparkSearchEngine(idx, docs_now)
    assert eng.search({"term": {"field": "text", "value": "body3"}},
                      size=5).count() == 0


def test_stream_upsert_off_keeps_collisions(tmp_path, spark):
    src = str(tmp_path / "src")
    base = spark.createDataFrame(
        [(1, "u", "alpha one", "en")],
        "doc_id long, url string, text string, lang string")
    base.write.parquet(src + "/a")
    again = spark.createDataFrame(
        [(1, "u", "alpha two", "en")],
        "doc_id long, url string, text string, lang string")
    again.write.parquet(src + "/b")
    stream = (spark.readStream.schema(base.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    idx_dir = str(tmp_path / "ix")
    q = stream_index_runs(stream, idx_dir, IndexConfig(**CFG),
                          upsert=False)
    q.awaitTermination(120)
    meta = merge_stream_runs(spark, idx_dir, IndexConfig(**CFG))
    assert meta["total_docs"] == 2  # documented collision-unsafe mode


def test_stream_keyed_upsert_by_url(tmp_path, spark):
    """key_col streams: urls map through the persisted keymap per batch
    (stable surrogate ids), and a re-crawled url upserts its previous
    generation exactly like batch upsert_by_key."""
    from search_engine_spark.operators.delete import load_index_with_deletes
    from search_engine_spark.operators.keymap import resolve_keys
    from search_engine_spark.plans.dsl import SparkSearchEngine

    src = str(tmp_path / "src")
    base = spark.createDataFrame(
        [(f"https://s.test/{i}", f"alpha body{i}") for i in range(12)],
        "url string, text string")
    base.write.parquet(src + "/a")
    recrawl = spark.createDataFrame(
        [("https://s.test/3", "alpha freshcopy"),
         ("https://s.test/99", "alpha newpage")],
        "url string, text string")
    recrawl.write.parquet(src + "/b")

    stream = (spark.readStream.schema(base.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    idx_dir = str(tmp_path / "ix")
    q = stream_index_runs(stream, idx_dir, IndexConfig(**CFG),
                          key_col="url")
    q.awaitTermination(120)

    idx = load_index_with_deletes(spark, idx_dir)
    assert idx.total_docs == 13  # 12 + 1 new url; re-crawl replaced
    km = {r["key"]: r["doc_id"]
          for r in resolve_keys(spark, idx_dir,
                                spark.createDataFrame(
                                    [(f"https://s.test/{i}",)
                                     for i in list(range(12)) + [99]],
                                    "url string"),
                                key_col="url").collect()}
    assert len(km) == 13 and len(set(km.values())) == 13
    docs_now = (base.where(~F.col("url").endswith("/3"))
                .unionByName(recrawl)
                .withColumn("doc_id", F.udf(lambda u: km[u], "long")("url")))
    eng = SparkSearchEngine(idx, docs_now)
    got = {r["doc_id"] for r in eng.search(
        {"term": {"field": "text", "value": "freshcopy"}}, size=5).collect()}
    assert got == {km["https://s.test/3"]}
    assert eng.search({"term": {"field": "text", "value": "body3"}},
                      size=5).count() == 0
    # the old generation is really masked: match_all is exactly the 13
    assert eng.search({"match_all": {}}, size=50).count() == 13
