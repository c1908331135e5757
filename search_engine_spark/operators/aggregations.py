"""Facets & aggregations (SURVEY.md §2.6, A1-A9) as groupBy pipelines.

The reference materializes facet/aggregation indexes (FacetEngine.ts:74,
AggregationIndex.ts:56-93 — field→value→Set<docId> plus global ordinals).
On Spark none of that is materialized: a facet is ``hits ⋈ docs`` then
``groupBy(field)``, which Catalyst executes with map-side partial
aggregation; Parquet dictionary encoding plays the role of global ordinals
(AggregationIndex.ts:307-339). The hit set is usually tiny relative to the
corpus, so the join side is broadcast.

Each function takes the docs table and an optional hits frame
(DataFrame[doc_id]); hits=None means the "global" context (A7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scope(docs: DataFrame, hits: DataFrame | None, id_col: str) -> DataFrame:
    if hits is None:
        return docs
    return docs.join(F.broadcast(hits.select(F.col("doc_id").alias(id_col)).distinct()),
                     id_col, "semi")


def terms_agg(docs: DataFrame, field: str, hits: DataFrame | None = None,
              size: int = 10, min_doc_count: int = 1,
              id_col: str = "doc_id") -> DataFrame:
    """terms aggregation (A2, FacetEngine.ts:151-179): value → doc_count,
    count desc (value asc tie-break for determinism), top ``size``."""
    scoped = _scope(docs, hits, id_col)
    return (scoped.where(F.col(field).isNotNull())
            .groupBy(F.col(field).alias("value"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .where(F.col("doc_count") >= min_doc_count)
            .orderBy(F.desc("doc_count"), F.asc("value"))
            .limit(size))


def sum_other_doc_count(docs: DataFrame, field: str, top: DataFrame,
                        hits: DataFrame | None = None,
                        id_col: str = "doc_id") -> int:
    """ES-style ``sum_other_doc_count`` companion to :func:`terms_agg`."""
    scoped = _scope(docs, hits, id_col).where(F.col(field).isNotNull())
    total = scoped.count()
    shown = top.agg(F.sum("doc_count")).collect()[0][0] or 0
    return int(total - shown)


def histogram_agg(docs: DataFrame, field: str, interval: float,
                  hits: DataFrame | None = None,
                  id_col: str = "doc_id") -> DataFrame:
    """histogram (A3, FacetEngine.ts:184-205): bucket = floor(v/interval)*interval."""
    scoped = _scope(docs, hits, id_col).where(F.col(field).isNotNull())
    bucket = (F.floor(F.col(field) / F.lit(interval)) * F.lit(interval))
    return (scoped.groupBy(bucket.cast("double").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy("bucket"))


def date_histogram_agg(docs: DataFrame, field: str, interval: str = "day",
                       hits: DataFrame | None = None,
                       id_col: str = "doc_id") -> DataFrame:
    """date_histogram (A4, FacetEngine.ts:210-263). Calendar intervals via
    date_trunc (reference uses fixed-ms buckets for 1M/1y — a known
    approximation there; calendar truncation is the canonical semantics)."""
    scoped = _scope(docs, hits, id_col).where(F.col(field).isNotNull())
    bucket = F.date_trunc(interval, F.col(field))
    if interval in ("day", "week", "month", "year"):
        bucket = F.to_date(bucket)
    return (scoped.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy("bucket"))


def range_agg(docs: DataFrame, field: str, ranges: list,
              hits: DataFrame | None = None,
              id_col: str = "doc_id") -> DataFrame:
    """range aggregation (A5, FacetEngine.ts:268-296): explicit [from, to)
    buckets with generated "from-to" keys; a doc lands in every range that
    contains it (ES semantics — ranges may overlap).

    ONE scan for any number of ranges: each range is a conditional-sum
    column over the same pass (map-side combined to a single row), then the
    1-row result unpivots to (key, doc_count) rows — versus one scan+union
    per range, which at 100 TB multiplies the input volume by |ranges|."""
    scoped = _scope(docs, hits, id_col).where(F.col(field).isNotNull())
    aggs, keys = [], []
    for i, r in enumerate(ranges):
        lo, hi = r.get("from"), r.get("to")
        key = r.get("key") or f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col(field) >= F.lit(lo))
        if hi is not None:
            pred = pred & (F.col(field) < F.lit(hi))
        keys.append(key)
        aggs.append(F.sum(F.when(pred, 1).otherwise(0))
                    .cast("long").alias(f"_r{i}"))
    row = scoped.agg(*aggs)
    pairs = F.array(*[F.struct(F.lit(k).alias("key"),
                               F.coalesce(F.col(f"_r{i}"), F.lit(0).cast("long"))
                               .alias("doc_count"))
                      for i, k in enumerate(keys)])
    return (row.select(F.posexplode(pairs).alias("_i", "_kv"))
            .orderBy("_i")
            .select(F.col("_kv.key").alias("key"),
                    F.col("_kv.doc_count").alias("doc_count")))


def filter_agg(docs: DataFrame, pred, sub, hits: DataFrame | None = None,
               id_col: str = "doc_id"):
    """filter aggregation (A8, SearchEngine.ts:1049-1100): restrict the
    scope by a column predicate, then run ``sub(scoped_docs)``."""
    scoped = _scope(docs, hits, id_col).where(pred)
    return sub(scoped)


def facets(docs: DataFrame, fields: list, hits: DataFrame | None = None,
           size: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Auto-facets (A1, FacetEngine.ts:124-136): per configured keyword
    field, value → count over the hit set. One frame
    (facet_field, value, doc_count), per-field top ``size``."""
    parts = []
    for f in fields:
        t = terms_agg(docs, f, hits=hits, size=size, id_col=id_col)
        parts.append(t.select(F.lit(f).alias("facet_field"),
                              F.col("value").cast("string").alias("value"),
                              "doc_count"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def nested_agg(docs: DataFrame, path: str, sub, hits: DataFrame | None = None,
               id_col: str = "doc_id"):
    """nested aggregation (A6, FacetEngine.ts:301-325): keep docs having the
    ``path`` struct (or array-of-struct, exploded), then run ``sub`` with
    fields addressed relative to the path.

    For array-of-struct paths each element becomes a row (ES nested-doc
    semantics); for plain structs the path is just column-pruned through.
    ``sub`` receives a frame whose columns are the struct's fields plus the
    id column."""
    scoped = _scope(docs, hits, id_col).where(F.col(path).isNotNull())
    dtype = dict(scoped.dtypes).get(path, "")
    if dtype.startswith("array"):
        inner = scoped.select(F.col(id_col), F.explode(path).alias("_n")) \
            .select(F.col(id_col), F.col("_n.*"))
    else:
        inner = scoped.select(F.col(id_col), F.col(f"{path}.*"))
    return sub(inner)
