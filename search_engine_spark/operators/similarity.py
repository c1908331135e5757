"""Similarity search over embedding columns (array<float>).

Not in the reference (its similarity is lexical BM25 only); required by the
training-data-pipeline surface. Two paths:

- **brute-force cosine top-k** — the correctness baseline: one broadcast of
  the query vector, one map over the corpus (dot product as a zip_with/
  aggregate column expression — JVM-side, no Python), then
  TakeOrderedAndProject for the global top-k. At 10^12 vectors this is a
  single full scan: embarrassingly parallel, no shuffle except the final
  top-k tree-reduce, which Spark's ``orderBy().limit()`` already does as
  per-partition top-k + driver merge.

- **random-hyperplane LSH (SimHash for vectors)** — the scale path: bucket =
  sign bits of dot(v, plane_i). Query probes only its own bucket (optionally
  multi-probe neighbors), turning the full scan into a partition-pruned read
  when the table is written partitioned by bucket. Planes are deterministic
  (taken from fixed corpus rows or a seeded generator) so oracles reproduce
  bucketing exactly.

Float discipline: embeddings are float32 on disk; all arithmetic casts to
double FIRST and folds in index order (F.aggregate is a left fold), so any
engine following the same order reproduces the sums bit-identically.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import round6


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] as a left fold in index order (both cast to double)."""
    prods = F.zip_with(a.cast("array<double>"), b.cast("array<double>"),
                       lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(vectors: DataFrame, query_vec: list, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude_id: int | None = None) -> DataFrame:
    """(vec_id, cos) top-k by cosine to ``query_vec``; ties break on id asc.

    The query vector is a literal array (broadcast by value into the plan);
    the scan is a single map + TakeOrderedAndProject.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = vectors.select(
        F.col(id_col).alias("vec_id"),
        round6(cosine(F.col(vec_col), q)).alias("cos"))
    if exclude_id is not None:
        scored = scored.where(F.col("vec_id") != exclude_id)
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def lsh_bucket(vec: Column, planes: list) -> Column:
    """Bucket id = bits of sign(dot(vec, plane_i)) packed little-endian.

    ``planes`` is a list of python float lists (deterministic). Pure column
    expression — at scale this is the partition column of the vector table.
    """
    out = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        out = out + F.when(dot(vec, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out.cast("int")


def lsh_topk(vectors: DataFrame, query_vec: list, planes: list, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_id: int | None = None) -> DataFrame:
    """ANN top-k: candidates = same LSH bucket as the query, ranked by cosine.

    With the table partitioned by bucket this reads 1/2^b of the data;
    recall is tunable via number of planes / multi-probe (not needed for the
    deterministic test corpus).
    """
    qb = 0
    for i, plane in enumerate(planes):
        s = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if s > 0:
            qb |= 1 << i
    scored = (vectors
              .where(lsh_bucket(F.col(vec_col), planes) == F.lit(qb))
              .select(F.col(id_col).alias("vec_id"),
                      round6(cosine(F.col(vec_col),
                              F.array(*[F.lit(float(x)) for x in query_vec]))
                       ).alias("cos")))
    if exclude_id is not None:
        scored = scored.where(F.col("vec_id") != exclude_id)
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def ivf_assign(vectors: DataFrame, centroids: list,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cell): IVF coarse quantization — each vector joins the cell
    of its max-cosine centroid (ties break to the lower centroid index).

    ``centroids`` are deterministic python float-lists (e.g. fixed corpus
    rows or an offline k-means); assignment is a pure column expression, and
    at scale the vector table is written partitioned by ``cell`` so probes
    read only the probed cells' partitions.
    """
    # LINEAR expression: array_max over (cos, -idx) structs. A chained
    # when(cos_i > best, ...) would embed the previous best TWICE per
    # step — the expression tree doubles per centroid and ~30 centroids
    # overflow the analyzer. Struct max compares cos first; the NEGATED
    # index makes equal-cos ties resolve to the LOWEST centroid index,
    # identical to the strict-greater chain's first-wins semantics.
    scores = F.array(*[
        F.struct(cosine(F.col(vec_col),
                        F.array(*[F.lit(float(x)) for x in c])).alias("c"),
                 F.lit(-i).alias("ni"))
        for i, c in enumerate(centroids)])
    cell = -F.array_max(scores)["ni"]
    return vectors.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("v"),
                          cell.cast("int").alias("cell"))


def ivf_topk(vectors: DataFrame, query_vec: list, centroids: list,
             k: int = 10, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_id: int | None = None) -> DataFrame:
    """IVF ANN top-k: probe the ``n_probe`` centroids nearest the query,
    rank their cells' members by exact cosine. Recall grows with n_probe;
    n_probe = len(centroids) degenerates to exact brute force."""
    def py_cos(a, b):
        dot_ = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) * float(x) for x in a) ** 0.5
        nb = sum(float(y) * float(y) for y in b) ** 0.5
        return dot_ / (na * nb)
    order = sorted(range(len(centroids)),
                   key=lambda i: (-py_cos(query_vec, centroids[i]), i))
    probed = order[:n_probe]
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = (assigned.where(F.col("cell").isin(probed))
              .select("vec_id", round6(cosine(F.col("v"), q)).alias("cos")))
    if exclude_id is not None:
        scored = scored.where(F.col("vec_id") != exclude_id)
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def embedding_neardup_pairs(vectors: DataFrame, planes: list,
                            threshold: float = 0.9,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            max_bucket_size: int = 10_000) -> DataFrame:
    """(a_id, b_id, cos): near-duplicate vector pairs, LSH-bucket-blocked.

    Pairs are generated only within an LSH bucket (linear candidate
    generation, like MinHash bands for text), then exactly verified by
    cosine >= threshold. ``max_bucket_size`` caps degenerate buckets
    (zero/boilerplate embeddings all signing into one bucket) so a single
    hot key can never go O(n²) — the same guardrail as the MinHash path's
    ``max_band_size`` (operators/dedup.py); capped buckets are dropped and
    their docs pair only through multi-probe/other planes.
    """
    bucketed = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"))
    sized = bucketed.join(
        bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")),
        "bucket").where(F.col("n") <= max_bucket_size).drop("n")
    a, b = sized.alias("a"), sized.alias("b")
    pairs = a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
    return (pairs.select(F.col("a.vec_id").alias("a_id"),
                         F.col("b.vec_id").alias("b_id"),
                         round6(cosine(F.col("a.v"), F.col("b.v"))).alias("cos"))
            .where(F.col("cos") >= threshold))


# ---------------------------------------------------------------------------
# Persisted ANN artifacts: the vector table written partitioned by LSH bucket
# and/or IVF cell, with the (deterministic) planes/centroids saved alongside.
# Query-time reads prune to the probed partitions — O(corpus/2^planes) or
# O(probed cells) scan volume instead of a full pass, the property that makes
# the ANN *query* path survive 10^12 vectors (the candidate generation was
# always linear; this fixes the per-query cost).
# ---------------------------------------------------------------------------

VECTORS = "vectors"
ANN_PARAMS = "ann_params.json"


def write_vectors(vectors: DataFrame, out_dir: str,
                  planes: list | None = None,
                  centroids: list | None = None,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> dict:
    """Persist the vector table partitioned by ``bucket`` (hyperplane LSH)
    and/or ``cell`` (IVF coarse quantization), plus the parameters that
    define the partitioning. At least one of planes/centroids is required.

    On a real deployment this is an Iceberg table with identity partitioning
    on the derived column; probes then hit Iceberg partition pruning. Here:
    plain parquet ``bucket=N/``/``cell=N/`` dirs + Catalyst partition
    pruning (asserted by tests via input_file_name()).
    """
    if not planes and not centroids:
        raise ValueError("write_vectors needs planes and/or centroids")
    out = vectors.select(F.col(id_col).alias("vec_id"),
                         F.col(vec_col).alias("embedding"))
    part_cols = []
    if planes:
        out = out.withColumn("bucket", lsh_bucket(F.col("embedding"), planes))
        part_cols.append("bucket")
    if centroids:
        assigned = ivf_assign(out, centroids, id_col="vec_id",
                              vec_col="embedding")
        out = out.join(assigned.select("vec_id", "cell"), "vec_id")
        part_cols.append("cell")
    (out.write.mode("overwrite").partitionBy(*part_cols)
     .parquet(os.path.join(out_dir, VECTORS)))
    params = {"planes": planes, "centroids": centroids,
              "id_col": id_col, "vec_col": vec_col,
              "partition_cols": part_cols}
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ANN_PARAMS), "w") as fh:
        json.dump(params, fh)
    return params


def load_vector_params(out_dir: str) -> dict:
    with open(os.path.join(out_dir, ANN_PARAMS)) as fh:
        return json.load(fh)


def _py_cos(a: list, b: list) -> float:
    dot_ = sum(float(x) * float(y) for x, y in zip(a, b))
    na = sum(float(x) * float(x) for x in a) ** 0.5
    nb = sum(float(y) * float(y) for y in b) ** 0.5
    return dot_ / (na * nb)


def query_bucket(query_vec: list, planes: list) -> int:
    """Pure-Python twin of :func:`lsh_bucket` for the query vector —
    computed driver-side, no Spark job."""
    qb = 0
    for i, plane in enumerate(planes):
        s = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if s > 0:
            qb |= 1 << i
    return qb


def probed_cells(query_vec: list, centroids: list, n_probe: int) -> list:
    """The n_probe centroid indices nearest the query (cos desc, idx asc)."""
    order = sorted(range(len(centroids)),
                   key=lambda i: (-_py_cos(query_vec, centroids[i]), i))
    return order[:n_probe]


def lsh_topk_persisted(spark: SparkSession, out_dir: str, query_vec: list,
                       k: int = 10, exclude_id: int | None = None) -> DataFrame:
    """ANN top-k over the persisted bucket-partitioned table: the query's
    bucket is computed driver-side (pure Python) and pushed as a partition
    predicate — the scan reads ONLY that bucket's files."""
    params = load_vector_params(out_dir)
    qb = query_bucket(query_vec, params["planes"])
    vecs = spark.read.parquet(os.path.join(out_dir, VECTORS))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = (vecs.where(F.col("bucket") == F.lit(qb))
              .select("vec_id",
                      round6(cosine(F.col("embedding"), q)).alias("cos")))
    if exclude_id is not None:
        scored = scored.where(F.col("vec_id") != exclude_id)
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def ivf_topk_persisted(spark: SparkSession, out_dir: str, query_vec: list,
                       k: int = 10, n_probe: int = 2,
                       exclude_id: int | None = None) -> DataFrame:
    """IVF ANN top-k over the persisted cell-partitioned table: probe cells
    chosen driver-side, pushed as a partition IN-list — only the probed
    cells' partitions are scanned (never a full ivf_assign recompute)."""
    params = load_vector_params(out_dir)
    probed = probed_cells(query_vec, params["centroids"], n_probe)
    vecs = spark.read.parquet(os.path.join(out_dir, VECTORS))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = (vecs.where(F.col("cell").isin(probed))
              .select("vec_id",
                      round6(cosine(F.col("embedding"), q)).alias("cos")))
    if exclude_id is not None:
        scored = scored.where(F.col("vec_id") != exclude_id)
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
