"""Persisted ANN artifacts: partition-pruned reads must touch only the
probed bucket/cell dirs, match the scan paths exactly, and the neardup
bucket cap must bound degenerate-bucket pair counts."""

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import similarity


@pytest.fixture(scope="module")
def vectors(spark):
    # deterministic 8-dim vectors: direction depends on vec_id % 4
    rows = []
    for i in range(200):
        base = [0.0] * 8
        base[i % 4] = 1.0
        base[(i % 4) + 4] = 0.5 + (i % 10) * 0.01
        rows.append((i, [float(x) for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .cache()


@pytest.fixture(scope="module")
def planes():
    return [[1.0, -1.0, 0.0, 0.0, 0.5, -0.5, 0.0, 0.0],
            [0.0, 0.0, 1.0, -1.0, 0.0, 0.0, 0.5, -0.5],
            [1.0, 1.0, -1.0, -1.0, 0.0, 0.0, 0.0, 0.0]]


@pytest.fixture(scope="module")
def artifact(tmp_path_factory, vectors, planes):
    out = str(tmp_path_factory.mktemp("ann"))
    similarity.write_vectors(vectors, out, planes=planes, centroids=planes)
    return out


def _qvec(vectors, vid=3):
    return [float(x) for x in vectors.where(
        F.col("vec_id") == vid).collect()[0]["embedding"]]


def test_persisted_lsh_matches_scan_path(spark, vectors, planes, artifact):
    q = _qvec(vectors)
    want = similarity.lsh_topk(vectors, q, planes, k=10, exclude_id=3).collect()
    got = similarity.lsh_topk_persisted(spark, artifact, q, k=10,
                                        exclude_id=3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and got


def test_persisted_ivf_matches_scan_path(spark, vectors, planes, artifact):
    q = _qvec(vectors)
    want = similarity.ivf_topk(vectors, q, planes, k=10, n_probe=2,
                               exclude_id=3).collect()
    got = similarity.ivf_topk_persisted(spark, artifact, q, k=10, n_probe=2,
                                        exclude_id=3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and got


def test_pruned_read_touches_only_probed_partitions(spark, vectors, planes,
                                                    artifact):
    """Runtime evidence of partition pruning: every file the filtered scan
    actually reads lives under the probed bucket's directory."""
    q = _qvec(vectors)
    qb = similarity.query_bucket(q, planes)
    vecs = spark.read.parquet(os.path.join(artifact, similarity.VECTORS))
    files = [r["f"] for r in
             (vecs.where(F.col("bucket") == qb)
              .select(F.input_file_name().alias("f")).distinct().collect())]
    assert files, "probed bucket read no files"
    assert all(f"bucket={qb}/" in f for f in files), files
    # and the artifact has other buckets that were NOT read
    buckets = {n for n in os.listdir(os.path.join(artifact, similarity.VECTORS))
               if n.startswith("bucket=")}
    assert len(buckets) > 1
    # same check for a cell probe
    cells = similarity.probed_cells(q, planes, 1)
    cfiles = [r["f"] for r in
              (vecs.where(F.col("cell").isin(cells))
               .select(F.input_file_name().alias("f")).distinct().collect())]
    assert cfiles and all(f"cell={cells[0]}/" in f for f in cfiles)


def test_neardup_bucket_cap_bounds_pairs(spark, planes):
    """A planted hot bucket (identical vectors) must be dropped when it
    exceeds max_bucket_size, bounding the self-join output."""
    hot = [(i, [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]) for i in range(50)]
    cold = [(100 + i, [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0])
            for i in range(3)]
    vecs = spark.createDataFrame(hot + cold,
                                 "vec_id long, embedding array<float>")
    uncapped = similarity.embedding_neardup_pairs(
        vecs, planes, threshold=0.9).count()
    assert uncapped == (50 * 49) // 2 + 3  # hot cross product + cold pairs
    capped = similarity.embedding_neardup_pairs(
        vecs, planes, threshold=0.9, max_bucket_size=10).count()
    assert capped == 3  # hot bucket dropped, cold bucket survives


def test_serving_vectors_bitwise_matches_spark(spark, vectors, artifact):
    """ServingVectors (pyarrow+numpy, no Spark) returns the EXACT rows of
    the Spark persisted readers — same ids, bitwise-equal round6 cosines
    (left-fold dot via np.add.accumulate == F.aggregate fold; float32
    products are exact in double)."""
    from search_engine_spark.serving_vectors import ServingVectors
    q = _qvec(vectors)
    sv = ServingVectors(artifact)

    want = [(r["vec_id"], r["cos"]) for r in
            similarity.lsh_topk_persisted(spark, artifact, q, k=10,
                                          exclude_id=3).collect()]
    got = sv.lsh_topk(q, k=10, exclude_id=3)
    assert got == want and got  # ids AND float bits

    want = [(r["vec_id"], r["cos"]) for r in
            similarity.ivf_topk_persisted(spark, artifact, q, k=10,
                                          n_probe=2, exclude_id=3).collect()]
    got = sv.ivf_topk(q, k=10, n_probe=2, exclude_id=3)
    assert got == want and got


def test_serving_vectors_guards(artifact, vectors):
    from search_engine_spark.serving_vectors import ServingVectors
    sv = ServingVectors(artifact)
    with pytest.raises(ValueError, match="dimension"):
        sv.lsh_topk([1.0, 2.0], k=5)
    with pytest.raises(FileNotFoundError):
        ServingVectors("/tmp/definitely_not_an_artifact_dir")


def test_serving_vectors_nan_ranks_like_spark(spark, planes, tmp_path):
    """A zero-norm embedding yields cos = 0/0 = NaN; Spark's orderBy(desc)
    treats NaN as greatest (ranks FIRST) — the serving twin must agree,
    not sink it past k."""
    from search_engine_spark.serving_vectors import ServingVectors
    rows = [(0, [0.0] * 8)] + [
        (i, [1.0 if j == i % 4 else 0.1 for j in range(8)])
        for i in range(1, 30)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = str(tmp_path / "annz")
    similarity.write_vectors(vecs, out, planes=planes)
    q = [1.0, 0.2, 0.1, 0.0, 0.3, 0.1, 0.0, 0.2]
    want = [(r["vec_id"], r["cos"]) for r in
            similarity.lsh_topk_persisted(spark, out, q, k=30).collect()]
    got = ServingVectors(out).lsh_topk(q, k=30)
    assert [d for d, _ in got] == [d for d, _ in want] and got
    import math
    for (gd, gc), (wd, wc) in zip(got, want):
        assert (math.isnan(gc) and math.isnan(wc)) or gc == wc, gd
