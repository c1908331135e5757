"""String-key (url) lifecycle: a persistent key → surrogate-id map.

The reference keys documents by whatever id the caller posts — for a
Common-Crawl-style corpus that is the url (QueryEngine.ts:137-149 saves
by ``document.id`` of any type). This engine's index internals want LONG
ids: doc-aligned posting blocks, delta+varbyte compression, the numpy
serving kernels and the tombstone tables all assume a dense numeric
``doc_id``. The bridge is a persisted KEYMAP — the ``docs`` dimension of
SURVEY §1.3 — mapping each natural key to a surrogate long exactly once:

- layout: ``keymap/chunk-<k>/`` parquet dirs (key string, doc_id long,
  km_bucket int), each chunk written to a temp dir and atomically
  ``os.rename``d in — a crash leaves complete chunks only. Chunks are
  bucketed by ``km_bucket = pmod(xxhash64(key), B)`` so a lookup prunes
  to the batch's buckets (the ds_bucket pattern, applied to keys).
- ids are assigned from a persisted high-water mark, densely per batch
  in key order — deterministic given the batch set, so oracles can
  reproduce them — and NEVER reassigned: a re-crawled url keeps its id,
  which is exactly what makes key-addressed upsert O(batch).
- crash rule: chunks are the source of truth; the meta high-water mark
  is a cache. ``_load_meta`` reconciles ``hwm = max(meta.hwm,
  max(chunk ids) + 1)`` so a crash between chunk-rename and meta-write
  can never double-assign an id.

``upsert_by_key`` / ``delete_by_key`` then compose the existing numeric
lifecycle (:func:`~.lsm.upsert_docs`, :func:`~.delete.delete_docs`)
under the mapping — a url-keyed corpus takes the same O(batch)
tombstone + run path as a long-keyed one.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEYMAP = "keymap"
KEYMAP_META = "keymap_meta.json"

#: fresh-key batches up to this size assign ids by ONE global key-order
#: sort (a single task — fine for mutation batches). Bigger batches — an
#: initial keyed build over a web-scale url corpus — switch to the
#: distributed per-bucket assignment (km_bucket-partitioned rank + an
#: exclusive per-bucket offset), which runs n_buckets parallel sorts and
#: never materializes the key set in one task. Both paths are
#: deterministic given the batch's key set (and n_buckets), dense from
#: the high-water mark, and never reassign.
KEY_ORDER_ASSIGN_MAX = 100_000


def _km_bucket_col(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                  F.lit(n_buckets)).cast("int").alias("km_bucket")


def _chunks(index_dir: str) -> list:
    d = os.path.join(index_dir, KEYMAP)
    if not os.path.isdir(d):
        return []
    return sorted(os.path.join(d, c) for c in os.listdir(d)
                  if c.startswith("chunk-"))


def _load_meta(index_dir: str, spark: SparkSession | None = None) -> dict:
    p = os.path.join(index_dir, KEYMAP_META)
    meta = {"hwm": 0, "n_buckets": 32, "n_chunks": 0}
    if os.path.isfile(p):
        with open(p) as fh:
            meta.update(json.load(fh))
    chunks = _chunks(index_dir)
    if spark is not None and chunks and \
            len(chunks) != int(meta.get("n_chunks", -1)):
        # chunks are the truth; the persisted hwm is a cache that a crash
        # between chunk-rename and meta-write may have left behind. The
        # reconcile scan runs ONLY when the chunk count disagrees with
        # the meta (exactly the crash signature), so the steady-state
        # batch path trusts the mark with no extra job.
        mx = (_read_map(spark, index_dir)
              .agg(F.max("doc_id").alias("m")).collect()[0]["m"])
        if mx is not None:
            meta["hwm"] = max(int(meta["hwm"]), int(mx) + 1)
        meta["n_chunks"] = len(chunks)
    return meta


def _write_meta(index_dir: str, meta: dict) -> None:
    p = os.path.join(index_dir, KEYMAP_META)
    tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, p)


def _read_map(spark: SparkSession, index_dir: str) -> DataFrame:
    chunks = _chunks(index_dir)
    if not chunks:
        return spark.createDataFrame(
            [], "key string, doc_id long, km_bucket int")
    return spark.read.parquet(*chunks)


def _append_chunk(mappings: DataFrame, index_dir: str) -> None:
    """Atomically add one chunk: full Spark write into a temp dir, then
    ONE os.rename into the keymap dir — readers glob complete chunks
    only. Partitioned write not needed: lookups prune via km_bucket
    row-group stats (each chunk is sorted by km_bucket, key)."""
    d = os.path.join(index_dir, KEYMAP)
    os.makedirs(d, exist_ok=True)
    k = 0
    while os.path.exists(os.path.join(d, f"chunk-{k:05d}")):
        k += 1
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}")
    (mappings.select("key", "doc_id", "km_bucket")
     .sortWithinPartitions("km_bucket", "key")
     .write.mode("overwrite").parquet(tmp))
    os.rename(tmp, os.path.join(d, f"chunk-{k:05d}"))
    # sweep orphaned temp dirs from crashed appends
    for junk in os.listdir(d):
        if junk.startswith(".tmp-"):
            shutil.rmtree(os.path.join(d, junk), ignore_errors=True)


#: key batches up to this size resolve via bucket-pruned scan +
#: broadcast join (point-lookup shape). Bigger batches — a bulk keyed
#: delete/re-crawl sweep — switch to a plain shuffle join over the whole
#: map: the batch would touch every bucket anyway, and broadcasting it
#: would not fit.
BROADCAST_KEYS_MAX = 1_000_000


def resolve_keys(spark: SparkSession, index_dir: str,
                 keys: DataFrame, key_col: str = "key") -> DataFrame:
    """(key, doc_id) for every batch key already mapped. Point-lookup
    shape (≤ BROADCAST_KEYS_MAX distinct keys): the map read is pruned
    to the batch's km_buckets (≤ n_buckets values, one tiny job) and the
    batch broadcasts — a lookup against a 10^12-key map touches a
    handful of row groups, not the table. Bulk shape: one shuffle join,
    no driver bucket set, no broadcast."""
    meta = _load_meta(index_dir)
    nb = int(meta["n_buckets"])
    km = _read_map(spark, index_dir)
    kd = (keys.select(F.col(key_col).cast("string").alias("key"))
          .distinct())
    n_keys = kd.count()
    if n_keys > BROADCAST_KEYS_MAX:
        return km.join(kd, "key").select("key", "doc_id").distinct()
    want = sorted({r["km_bucket"] for r in
                   kd.select(_km_bucket_col("key", nb))
                   .distinct().collect()})
    if want:
        km = km.where(F.col("km_bucket").isin(want))
    return (km.join(F.broadcast(kd), "key")
        .select("key", "doc_id")
        # distinct: a consolidation crash can leave a key in two chunks
        # (same doc_id both — the map is append-only per key); resolve
        # must still hand back one row per key
        .distinct())


def map_keys(docs: DataFrame, index_dir: str,
             key_col: str = "key") -> DataFrame:
    """Attach the surrogate ``doc_id`` to every row of ``docs``,
    assigning fresh ids (dense from the high-water mark, in key order —
    deterministic per batch) to keys never seen before and persisting
    the new mappings. Returns ``docs`` + ``doc_id``."""
    spark = docs.sparkSession
    meta = _load_meta(index_dir, spark)
    nb = int(meta["n_buckets"])
    keys = (docs.select(F.col(key_col).cast("string").alias("key"))
            .distinct().localCheckpoint())
    # a NULL key has no identity to map — the inner join below would
    # silently drop its rows; fail loudly instead (ids_frame pattern)
    if keys.where(F.col("key").isNull()).limit(1).count():
        raise ValueError(
            f"map_keys: column {key_col!r} holds NULL keys — every "
            "document needs a non-null natural key to take the keyed "
            "lifecycle")
    known = resolve_keys(spark, index_dir, keys).localCheckpoint()
    fresh = keys.join(known, "key", "anti")
    n_fresh = fresh.count()
    if n_fresh:
        from pyspark.sql import Window
        hwm = int(meta["hwm"])
        if n_fresh <= KEY_ORDER_ASSIGN_MAX:
            w = Window.orderBy("key")  # batch-sized sort: deterministic
            new_map = (fresh.withColumn(
                "doc_id", (F.row_number().over(w) - 1 + F.lit(hwm))
                .cast("long"))
                .select("key", "doc_id", _km_bucket_col("key", nb)))
        else:
            # distributed assignment (initial web-scale build): rank
            # within each km_bucket, then add an exclusive bucket offset
            # — n_buckets parallel sorts instead of one global one; ids
            # stay dense [hwm, hwm+n_fresh) and deterministic (bucket fn
            # is a pure hash, per-bucket key order is total)
            fb = fresh.select("key", _km_bucket_col("key", nb))
            counts = {int(r["km_bucket"]): int(r["n"]) for r in
                      fb.groupBy("km_bucket")
                      .agg(F.count(F.lit(1)).alias("n")).collect()}
            offs, acc = [], hwm
            for b in sorted(counts):
                offs.append((b, acc))
                acc += counts[b]
            off_df = spark.createDataFrame(
                offs, "km_bucket int, __off long")
            w = Window.partitionBy("km_bucket").orderBy("key")
            new_map = (fb.join(F.broadcast(off_df), "km_bucket")
                       .withColumn("doc_id",
                                   (F.row_number().over(w) - 1
                                    + F.col("__off")).cast("long"))
                       .select("key", "doc_id", "km_bucket"))
        new_map = new_map.localCheckpoint()
        _append_chunk(new_map, index_dir)
        meta["hwm"] = hwm + n_fresh
        meta["n_chunks"] = len(_chunks(index_dir))
        _write_meta(index_dir, meta)
        known = known.unionByName(new_map.select("key", "doc_id"))
    # batch-sized map slice: broadcast it onto the docs (keeps the docs
    # frame's own partitioning; the key column stays on the row)
    lk = known.withColumnRenamed("key", "__km_key")
    return (docs.join(F.broadcast(lk),
                      F.col(key_col).cast("string") == F.col("__km_key"))
            .drop("__km_key"))


def build_keymap(docs: DataFrame, index_dir: str, key_col: str = "key",
                 n_buckets: int = 32) -> DataFrame:
    """Initialize the map for a fresh index build over a string-keyed
    corpus and return ``docs`` + ``doc_id``. Ids are dense in key order
    (row_number — one global sort of the KEYS, not the documents), the
    layout doc-aligned blocks want."""
    if _chunks(index_dir):
        # existing map (e.g. a RESUMED --chunks build re-running this):
        # keep its meta — resetting hwm here would rely on the reconcile
        # scan to avoid double-assigning ids; extending is map_keys' job
        return map_keys(docs, index_dir, key_col=key_col)
    meta = {"hwm": 0, "n_buckets": int(n_buckets)}
    _write_meta(index_dir, meta)
    return map_keys(docs, index_dir, key_col=key_col)


def consolidate_keymap(spark: SparkSession, index_dir: str,
                       min_chunks: int = 8) -> dict:
    """Fold the per-batch chunks into ONE (bounds the map's file count in
    the batch count — the docs_runs consolidation pattern applied to the
    keymap). Crash-safe order: write the folded chunk to a temp dir,
    rename it in as the LOWEST chunk name... impossible while chunk-00000
    exists — so instead: write folded as a NEW chunk, then remove the
    source chunks. A crash in between leaves duplicate (key, doc_id) rows
    — harmless: the map is append-only and every row for a key carries
    the SAME doc_id, so resolve's distinct-by-join is unaffected and the
    next consolidation folds the leftovers."""
    chunks = _chunks(index_dir)
    if len(chunks) < int(min_chunks):
        return {"folded": 0, "n_chunks": len(chunks)}
    folded = (spark.read.parquet(*chunks)
              .dropDuplicates(["key"]).localCheckpoint())
    _append_chunk(folded, index_dir)
    for c in chunks:
        shutil.rmtree(c, ignore_errors=True)
    meta = _load_meta(index_dir)
    meta["n_chunks"] = len(_chunks(index_dir))
    _write_meta(index_dir, meta)
    return {"folded": len(chunks), "n_chunks": meta["n_chunks"]}


def upsert_by_key(docs: DataFrame, index_dir: str, config,
                  key_col: str = "key", current: DataFrame | None = None):
    """Key-addressed upsert: map the batch's keys (assigning fresh ids to
    new keys), then run the numeric :func:`~.lsm.upsert_docs` — a
    re-crawled url replaces its previous generation via the same
    O(batch) pending-tombstone + run path."""
    from .lsm import upsert_docs
    mapped = map_keys(docs, index_dir, key_col=key_col)
    if current is not None and config.id_col not in current.columns:
        current = map_keys(current, index_dir, key_col=key_col)
    return upsert_docs(mapped, index_dir, config, current=current)


def delete_by_key(spark: SparkSession, index_dir: str, keys,
                  key_col: str = "key") -> dict:
    """Key-addressed delete: resolve the keys (unknown keys are ignored,
    reference removeDocument semantics for absent ids) and tombstone the
    surrogate ids — frame-native end to end."""
    from .delete import delete_docs
    if not isinstance(keys, DataFrame):
        keys = spark.createDataFrame([(str(k),) for k in keys],
                                     "key string")
        key_col = "key"
    ids = resolve_keys(spark, index_dir, keys, key_col=key_col) \
        .select("doc_id")
    return delete_docs(spark, index_dir, ids)
