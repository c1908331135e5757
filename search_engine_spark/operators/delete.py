"""Document deletes over the persisted index (SURVEY I5).

The reference deletes by sweeping every shard's Maps in place
(SearchEngine.ts:265-283, ShardedInvertedIndex.ts:400-428). An immutable
columnar index can't mutate in place; this module implements the
merge-on-read pattern (what Iceberg row-level deletes do under the hood):

- :func:`delete_docs` appends doc ids to a ``tombstones`` table and updates
  the collection stats in meta (one small aggregate job — no index rewrite;
  O(deleted) not O(index)).
- :func:`load_index` (via index_build.load_index hook below) applies the
  tombstone anti-join at read time, so queries never see deleted docs and
  BM25 uses the post-delete N/avgdl.
- :func:`compact_deletes` rewrites the postings/doc_stats/term_stats tables
  without the tombstoned rows and clears the tombstone table — run when the
  tombstone fraction crosses a threshold, exactly like Iceberg compaction.

Delete → re-add (the reference's in-process ``add()`` is an upsert:
``QueryEngine.ts:137-149`` replaces the stored doc and re-indexes, so a
deleted id can come back): physically purged ids whose rows still exist in
the REGISTERED docs table (user input parquet — never rewritten) move to a
``docs_tombstones`` mask table, the docs-table twin of Iceberg positional
deletes. Re-adding such an id (``lsm.append_docs``) simply removes it from
the mask; re-adding an id that is still tombstoned escalates to
:func:`compact_deletes` first, preserving the invariant every reader
relies on — a tombstoned id never has live postings anywhere.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index_build import (DOC_STATS, META, POSTINGS, TERM_STATS, IndexConfig,
                          InvertedIndex, build_term_stats, load_index)

TOMBSTONES = "tombstones"
DOCS_TOMBSTONES = "docs_tombstones"
DOCS_TOMBSTONES_FILE = "docs_tombstones.parquet"


def docs_tombstones_path(index_dir: str) -> str | None:
    """Path of the docs_tombstones mask if one exists — the single-file
    layout (current) or the directory layout (pre-atomic-swap), else
    None."""
    f = os.path.join(index_dir, DOCS_TOMBSTONES_FILE)
    if os.path.isfile(f):
        return f
    d = os.path.join(index_dir, DOCS_TOMBSTONES)
    if os.path.isdir(d):
        return d
    return None


def _rewrite_docs_tombstones(spark: SparkSession, index_dir: str,
                             ids: DataFrame | None) -> None:
    """Atomically replace the docs_tombstones mask with ``ids``.

    The mask is a SINGLE parquet file swapped in with ``os.replace`` — a
    crash mid-rewrite leaves either the old complete mask or the new
    complete mask, never a missing one (losing it would silently
    RESURRECT purged docs in docs-table queries). The ids are collected
    driver-side to build that file: the mask is bounded by lifetime
    deletes of registered-corpus docs and every consumer broadcasts it
    anyway, so boundedness is already a design assumption; at 10^12-doc
    scale with heavy delete churn the layout would become
    doc_id-bucketed files swapped per bucket — the same invariant,
    applied per bucket.
    """
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    fpath = os.path.join(index_dir, DOCS_TOMBSTONES_FILE)
    legacy = os.path.join(index_dir, DOCS_TOMBSTONES)
    vals = [] if ids is None else sorted(
        {int(r["doc_id"]) for r in
         ids.select(F.col("doc_id").cast("long")).collect()})
    if not vals:
        try:
            os.remove(fpath)
        except FileNotFoundError:
            pass
        shutil.rmtree(legacy, ignore_errors=True)
        return
    tmp = fpath + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(vals, pa.int64())}), tmp)
    os.replace(tmp, fpath)
    # the file now carries the full folded mask; drop the legacy dir last
    shutil.rmtree(legacy, ignore_errors=True)


def load_docs_tombstones(spark: SparkSession, index_dir: str):
    """DataFrame[doc_id] of physically purged ids whose registered
    docs-table rows must stay invisible, or None. Bounded by lifetime
    deletes of registered-corpus docs (appended docs' value rows live in
    ``docs_runs`` — ours to rewrite — so they never need masking)."""
    p = docs_tombstones_path(index_dir)
    if p is None:
        return None
    return spark.read.parquet(p).select("doc_id").distinct()


def _doc_stats_with_runs(spark: SparkSession, index_dir: str):
    """Base doc_stats ∪ live LSM append/stream runs (the same union view
    load_index serves) — delete bookkeeping must count appended docs too."""
    from .lsm import live_runs, read_run_doc_stats
    base_p = os.path.join(index_dir, DOC_STATS)
    ds = (spark.read.parquet(base_p).select("doc_id", "dl")
          if os.path.isdir(base_p) else None)
    runs = live_runs(index_dir)
    if runs:
        run_ds = read_run_doc_stats(
            spark, [e["doc_stats_path"] for e in runs])
        ds = run_ds if ds is None else ds.unionByName(run_ds)
    return ds


def delete_docs(spark: SparkSession, index_dir: str, doc_ids: list) -> dict:
    """Tombstone ``doc_ids`` and refresh collection stats. Returns new meta."""
    base_ds = _doc_stats_with_runs(spark, index_dir)
    if base_ds is None:  # validate BEFORE appending tombstones — a bad
        # path must not leave a tombstone table next to stale meta
        raise FileNotFoundError(
            f"no index at {index_dir}: neither {DOC_STATS}/ nor any "
            "committed run exists — build or append first")
    tomb_path = os.path.join(index_dir, TOMBSTONES)
    spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long") \
        .write.mode("append").parquet(tomb_path)
    tomb = spark.read.parquet(tomb_path).distinct()
    ds = base_ds.join(tomb, "doc_id", "anti")
    stats = ds.agg(F.count(F.lit(1)).alias("n"),
                   F.avg("dl").alias("avgdl"),
                   F.sum("dl").alias("dlsum")).collect()[0]
    meta_path = os.path.join(index_dir, META)
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta["total_docs"] = int(stats["n"])
    meta["avg_dl"] = float(stats["avgdl"] or 0.0)
    meta["dl_sum"] = int(stats["dlsum"] or 0)
    meta["n_tombstones"] = tomb.count()
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, indent=1)
    return meta


def load_index_with_deletes(spark: SparkSession, index_dir: str) -> InvertedIndex:
    """load_index + tombstone anti-joins (merge-on-read view)."""
    idx = load_index(spark, index_dir)
    tomb_path = os.path.join(index_dir, TOMBSTONES)
    if os.path.isdir(tomb_path):
        tomb = spark.read.parquet(tomb_path).distinct()
        idx.postings = idx.postings.join(tomb, "doc_id", "anti")
        idx.doc_stats = idx.doc_stats.join(tomb, "doc_id", "anti")
        # df must shrink for terms whose postings died with the docs
        idx.term_stats = build_term_stats(idx.postings)
        # expose the tombstone frame so block-index readers (wand_topk,
        # ServingIndex) can apply the same merge-on-read filter — the blocks
        # table is immutable and still contains the deleted docs' payloads
        idx.tombstones = tomb
    # docs-table mask for physically purged ids (their postings are gone,
    # but the registered docs table still holds their rows) — consumed by
    # dsl._live for pure docs-table queries
    dt = load_docs_tombstones(spark, index_dir)
    if dt is not None:
        idx.docs_tombstones = dt
    return idx


def compact_deletes(spark: SparkSession, index_dir: str) -> dict:
    """Apply tombstones physically: rewrite the index tables without the
    deleted rows and drop the tombstone table."""
    import shutil

    # live LSM runs must fold into the base FIRST: they may hold postings
    # of tombstoned docs, and clearing the tombstone table with raw runs
    # still live would resurrect those docs on the next load
    from .lsm import compact_runs, live_runs
    if live_runs(index_dir):
        compact_runs(spark, index_dir)

    tomb_path = os.path.join(index_dir, TOMBSTONES)
    if not os.path.isdir(tomb_path):
        with open(os.path.join(index_dir, META)) as fh:
            return json.load(fh)
    tomb = spark.read.parquet(tomb_path).distinct()

    with open(os.path.join(index_dir, META)) as fh:
        meta = json.load(fh)
    config = IndexConfig(id_col=meta["id_col"], fields=meta["fields"],
                         n_buckets=meta["n_buckets"],
                         positions=meta["positions"])

    p = spark.read.parquet(os.path.join(index_dir, POSTINGS)) \
        .join(tomb, "doc_id", "anti")
    tmp = os.path.join(index_dir, POSTINGS + ".compact")
    (p.repartition(config.n_buckets, "bucket")
     .sortWithinPartitions("field", "term", "doc_id")
     .write.mode("overwrite").partitionBy("bucket").parquet(tmp))
    shutil.rmtree(os.path.join(index_dir, POSTINGS))
    os.rename(tmp, os.path.join(index_dir, POSTINGS))

    # rewrite doc_stats through the canonical bucketed writer so the
    # append-dedup pruning layout (ds_bucket partitions) survives delete
    # compaction; staged next to the live dir, then swapped
    from .index_build import write_doc_stats
    ds = spark.read.parquet(os.path.join(index_dir, DOC_STATS)) \
        .join(tomb, "doc_id", "anti")
    tmp_root = os.path.join(index_dir, DOC_STATS + ".compactdir")
    os.makedirs(tmp_root, exist_ok=True)
    ds_buckets = int(meta.get("ds_buckets") or meta["n_buckets"])
    write_doc_stats(ds, tmp_root, ds_buckets)
    # a legacy meta (no ds_buckets) must learn the bucket count the
    # rewrite just used, or existing_ids_pruned reads 0 and never prunes
    meta["ds_buckets"] = ds_buckets
    shutil.rmtree(os.path.join(index_dir, DOC_STATS))
    os.rename(os.path.join(tmp_root, DOC_STATS),
              os.path.join(index_dir, DOC_STATS))
    shutil.rmtree(tmp_root, ignore_errors=True)

    postings_r = spark.read.parquet(os.path.join(index_dir, POSTINGS))
    build_term_stats(postings_r).sortWithinPartitions(
        "field", "term").write.mode("overwrite").parquet(
        os.path.join(index_dir, TERM_STATS))

    ds = spark.read.parquet(os.path.join(index_dir, DOC_STATS))
    stats = ds.agg(F.count(F.lit(1)).alias("n"),
                   F.avg("dl").alias("avgdl"),
                   F.sum("dl").alias("dlsum")).collect()[0]
    meta["total_docs"] = int(stats["n"])
    meta["avg_dl"] = float(stats["avgdl"] or 0.0)
    meta["dl_sum"] = int(stats["dlsum"] or 0)
    meta["n_postings"] = postings_r.count()
    meta.pop("n_tombstones", None)
    # dropping the tombstone table removes the merge-on-read filter a
    # pre-existing block snapshot depends on — bump the delete epoch so
    # check_blocks_fresh refuses those blocks instead of resurrecting
    # the physically-deleted docs
    meta["delete_epoch"] = int(meta.get("delete_epoch", 0)) + 1

    # the registered docs table is user input and cannot be rewritten, so
    # purged ids move to the docs_tombstones mask (or this compaction
    # would RESURRECT them in pure docs-table queries — range/geo/exists
    # scan the raw docs table and, pre-mask, only filtered the live
    # tombstone set this function just cleared). docs_runs batches are
    # ours: purge their rows physically instead of masking them.
    prev = load_docs_tombstones(spark, index_dir)
    folded = tomb.select("doc_id") if prev is None \
        else prev.unionByName(tomb.select("doc_id"))
    _rewrite_docs_tombstones(spark, index_dir, folded)
    dr_root = os.path.join(index_dir, "docs_runs")
    if os.path.isdir(dr_root):
        from .lsm import dir_has_parquet
        for chunk in sorted(os.listdir(dr_root)):
            d = os.path.join(dr_root, chunk)
            if not os.path.isdir(d) or not dir_has_parquet(d):
                continue
            batch = spark.read.parquet(d)
            idc = meta["id_col"]
            dead = batch.join(
                tomb.select(F.col("doc_id").cast(
                    batch.schema[idc].dataType).alias(idc)), idc, "semi")
            if dead.limit(1).count():
                keep = batch.join(dead.select(idc), idc, "anti")
                tmp = d + ".compact"
                keep.write.mode("overwrite").parquet(tmp)
                shutil.rmtree(d)
                os.rename(tmp, d)

    with open(os.path.join(index_dir, META), "w") as fh:
        json.dump(meta, fh, indent=1)
    shutil.rmtree(tomb_path)
    return meta
