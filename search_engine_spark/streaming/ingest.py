"""Structured Streaming ingest: incremental index builds + windowed aggs.

The reference's ingest is batch `add()` with interval-triggered persistence
(AutoPersistenceManager.ts:1-74, saveOnAdd/batchSize config) — its closest
Spark-native expression is a streaming source driving `foreachBatch`, where
every micro-batch appends a posting RUN (same layout as the resumable
build's chunks, operators/index_build.py) and commits a manifest entry.
Runs are merged into the global term-partitioned index by the same
shuffle-merge used for batch resume — so streaming and batch builds share
one on-disk contract and one merge path.

Exactly-once-ish: foreachBatch can re-run a batch on failure; runs are
written to `runs/stream_batch=<id>` with overwrite + manifest commit last,
so replays are idempotent (same batch id → same path, manifest rewrite).

Also provides the watermarked windowed aggregation (the streaming twin of
the date_histogram/terms aggs) — late events beyond the watermark are
dropped by Spark's state store, bounding state at 100 TB/day event rates.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.index_build import (MANIFEST, RUNS, IndexConfig,
                                     build_doc_stats, build_postings)


def stream_index_runs(pages_stream: DataFrame, index_dir: str,
                      config: IndexConfig, checkpoint_dir: str | None = None,
                      trigger_available_now: bool = True,
                      upsert: bool = True,
                      key_col: str | None = None):
    """Start a streaming query appending per-micro-batch posting runs.

    ``upsert=True`` (default — the reference's ``add()`` replaces on id
    collision, QueryEngine.ts:137-149) gives re-crawl semantics: a
    streamed page whose id is already live tombstones the old generation
    at the current barrier before the batch's run is written above it —
    O(batch ds_bucket-pruned lookup + tombstone swap), nothing physically
    rewritten, exactly the HTTP upsert path's mask mechanics. With
    ``upsert=False`` colliding ids simply coexist (pre-round-4 behavior:
    only safe when the source is known collision-free).

    ``key_col`` — a STRING-keyed stream (e.g. urls from a re-crawl feed):
    each micro-batch first maps its keys through the persisted keymap
    (:func:`~..operators.keymap.map_keys` — a re-seen url resolves to its
    existing surrogate id, a new one is assigned from the high-water
    mark), then the numeric path runs unchanged, so a re-crawled url
    upserts its previous generation exactly like the batch
    :func:`~..operators.keymap.upsert_by_key`. Replays are safe: mapping
    an already-mapped key returns the same id and assigns nothing.

    Returns the StreamingQuery; call ``.awaitTermination()`` (availableNow
    drains the source and stops) then :func:`merge_stream_runs`.
    """
    os.makedirs(os.path.join(index_dir, MANIFEST), exist_ok=True)

    def process_batch(batch_df: DataFrame, batch_id: int):
        # shared LSM run writer: per-batch doc_stats via the SAME
        # build_doc_stats as the batch path (scalar fields only, zero-token
        # docs kept with dl=0, SearchEngine.ts:894-898) so streaming and
        # batch builds of one corpus produce identical total_docs/avg_dl
        # and hence BM25 scores. The manifest-then-reconcile commit keeps
        # meta additively exact per batch, so the index is QUERYABLE
        # between batches (load_index unions the committed runs) with no
        # merge job; replays (foreachBatch re-runs) are idempotent.
        from ..operators.lsm import _manifest_entries, write_run
        manifest_name = f"stream-{batch_id:05d}.json"
        if upsert:
            # replay no-op guard FIRST: a committed batch must not
            # re-tombstone its own ids as "collisions"
            if any(name == manifest_name and
                   e.get("status") in ("committed", "compacted")
                   for name, e in _manifest_entries(index_dir)):
                return
            if key_col is not None:
                from ..operators.keymap import map_keys
                batch_df = map_keys(batch_df, index_dir, key_col=key_col)
            batch_df = batch_df.dropDuplicates([config.id_col])
            from ..operators.lsm import existing_ids_pruned
            existing = existing_ids_pruned(batch_df.sparkSession, index_dir,
                                           batch_df, config.id_col)
            raw = [r[0] for r in  # try_cast: ANSI cast would throw mid-job
                   batch_df.join(existing, config.id_col, "semi")
                   .select(F.col(config.id_col).try_cast("long"))
                   .distinct().collect()]
            if any(v is None for v in raw):
                raise ValueError(
                    "streaming upsert needs long-castable doc ids (the "
                    "tombstone tables key on doc_id long, like "
                    "upsert_docs)")
            colliding = [int(v) for v in raw]
        else:
            if key_col is not None:
                from ..operators.keymap import map_keys
                batch_df = map_keys(batch_df, index_dir, key_col=key_col)
            colliding = []
        extra = None
        if colliding:
            # PENDING tombstone named after this batch's run: it masks
            # nothing until the manifest commit below, so the old page
            # version serves until the exact moment the new one does;
            # the entry's replaced-(count, dl) makes the stats delta
            # atomic with the commit (upsert_docs mechanics)
            from ..operators.delete import delete_docs
            from ..operators.lsm import live_doc_dl
            spark = batch_df.sparkSession
            replaced_dl = live_doc_dl(spark, index_dir, colliding)
            delete_docs(spark, index_dir, colliding,
                        pending_run=f"stream_batch={batch_id}")
            extra = {"replaced_docs": len(colliding),
                     "replaced_dl": replaced_dl}
        write_run(batch_df, index_dir, config,
                  run_key=f"stream_batch={batch_id}",
                  manifest_name=manifest_name,
                  lineage={"source": "stream", "batch_id": batch_id},
                  entry_extra=extra)

    writer = (pages_stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation",
                      checkpoint_dir or os.path.join(index_dir, "_checkpoint")))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_stream_runs(spark, index_dir: str, config: IndexConfig) -> dict:
    """Merge all committed stream runs into the final bucketed index tables
    (same layout as write_index) and return meta.

    When a base postings table already EXISTS, this delegates to the
    incremental :func:`~..operators.lsm.compact_runs` — folding runs into
    only their affected bucket partitions — instead of the full from-runs
    rebuild, which would drop base rows not present in the runs. The full
    rebuild path remains for stream-only dirs (no base yet) and marks the
    merged runs compacted so load_index never double-counts them."""
    from ..operators.index_build import (DOC_STATS, META, POSTINGS,
                                         TERM_STATS, _bucket_col,
                                         build_term_stats)
    from ..operators.lsm import compact_runs, mark_compacted
    if os.path.isdir(os.path.join(index_dir, POSTINGS)):
        return compact_runs(spark, index_dir)
    mdir = os.path.join(index_dir, MANIFEST)
    merged_entries = []
    run_paths, ds_paths = [], []
    for name in sorted(os.listdir(mdir)):
        with open(os.path.join(mdir, name)) as fh:
            entry = json.load(fh)
        if entry.get("status") == "committed":
            merged_entries.append(entry)
            run_paths.append(entry["run_path"])
            if entry.get("doc_stats_path"):
                ds_paths.append(entry["doc_stats_path"])
    runs = spark.read.parquet(*run_paths)
    (runs.withColumn("bucket", _bucket_col(config))
     .repartition(config.n_buckets, "bucket")
     .sortWithinPartitions("field", "term", "doc_id")
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(index_dir, POSTINGS)))
    postings_r = spark.read.parquet(os.path.join(index_dir, POSTINGS))
    # doc_stats = union of the per-batch build_doc_stats runs (scalar-field
    # token counts incl. zero-token docs — identical to the batch path;
    # streaming corpus docs must carry unique ids across batches). Falls
    # back to postings-derived dl only for pre-doc_stats-run layouts, where
    # array fields cannot be told apart (documented divergence).
    if ds_paths:
        from ..operators.lsm import read_run_doc_stats
        dl = read_run_doc_stats(spark, ds_paths)
    else:
        dl = (postings_r.where(F.col("field").isin(list(config.fields)))
              .groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl")))
    from ..operators.index_build import write_doc_stats
    write_doc_stats(dl, index_dir, config.n_buckets)
    build_term_stats(postings_r).sortWithinPartitions(
        "field", "term").write.mode("overwrite").parquet(
        os.path.join(index_dir, TERM_STATS))
    ds = spark.read.parquet(os.path.join(index_dir, DOC_STATS))
    stats = ds.agg(F.count(F.lit(1)).alias("n"),
                   F.avg("dl").alias("avgdl"),
                   F.sum("dl").alias("dlsum")).collect()[0]
    from ..operators.index_build import BUCKET_FN
    meta = {
        "total_docs": int(stats["n"]), "avg_dl": float(stats["avgdl"] or 0.0),
        "dl_sum": int(stats["dlsum"] or 0),
        "n_postings": postings_r.count(), "id_col": config.id_col,
        "fields": config.fields, "n_buckets": config.n_buckets,
        "positions": config.positions,
        "stem_lang": config.stem_lang,
        "stem_lang_col": config.stem_lang_col,
        "analyzers": config.analyzers,
        "bucket_fn": BUCKET_FN,
        "ds_buckets": config.n_buckets,
        "source": "stream",
        # runs are now IN the base: record them as applied so a later
        # append's reconcile_meta never re-counts them
        "applied_runs": [e["chunk"] for e in merged_entries],
    }
    # this merge IS a compaction — carry the prior meta's lifecycle
    # markers forward instead of resetting them: compaction_seq keeps
    # refresh_blocks' crash-replay journal key (seq, buckets) unique
    # across distinct compactions (lsm.compact_runs bumps it the same
    # way), and delete_epoch must survive or a pre-merge delete
    # compaction would stop invalidating old block snapshots
    mp = os.path.join(index_dir, META)
    prior = {}
    if os.path.isfile(mp):
        with open(mp) as fh:
            prior = json.load(fh)
    meta["compaction_seq"] = int(prior.get("compaction_seq", 0)) + 1
    if prior.get("delete_epoch") is not None:
        meta["delete_epoch"] = prior["delete_epoch"]
    from ..operators.index_build import write_meta
    write_meta(index_dir, meta)
    # the from-runs rebuild wrote every bucket partition — record the
    # full bucket range as the compaction's footprint for refresh_blocks
    mark_compacted(index_dir, merged_entries,
                   buckets=list(range(config.n_buckets)))
    return meta


def windowed_event_counts(events_stream: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours",
                          ts_col: str = "ts",
                          key_col: str = "event_type") -> DataFrame:
    """Watermarked tumbling-window counts — the streaming date_histogram.

    State is bounded: windows older than the watermark are finalized and
    evicted; late events beyond it are dropped (documented ES-unlike
    behavior — the batch aggs see all data, the stream sees the watermark)."""
    return (events_stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"),
                     F.col(key_col))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .select(F.col("win.start").alias("bucket"), key_col, "doc_count"))
