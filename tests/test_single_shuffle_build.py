"""The persisted build's single-exchange plan (round 5).

write_index aggregates postings keyed by (bucket, field, term, doc_id)
over token rows repartition(B, bucket)-ed: bucket is a pure function of
(field, term), so HashPartitioning(bucket) satisfies the aggregation's
ClusteredDistribution (partitioning exprs ⊆ grouping keys) and Catalyst
plans NO second exchange — the build moves token rows across the wire
exactly once, vs the legacy groupBy-shuffle + repartition-shuffle plan.

These tests pin (a) the plan shape — exactly one Exchange — and (b) row-
level parity of the written index against the legacy two-shuffle plan
(kept toggleable via SE_BUILD_TWO_SHUFFLE=1 for interleaved A/Bs).
"""

import os

import pytest

from search_engine_spark.operators.index_build import (IndexConfig,
                                                       _bucket_col,
                                                       build_postings,
                                                       write_index)
from search_engine_spark.sources.synth import synth_pages


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, 300, partitions=4).cache()


CFG = dict(id_col="doc_id", fields={"text": "text"}, n_buckets=8)


def test_single_exchange_plan(pages):
    cfg = IndexConfig(**CFG)
    plan = (build_postings(pages, cfg, with_dl=True, pre_bucket=True)
            .sortWithinPartitions("bucket", "field", "term", "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan
    legacy = (build_postings(pages, cfg, with_dl=True)
              .select("*", _bucket_col(cfg))
              .repartition(cfg.n_buckets, "bucket")
              .sortWithinPartitions("bucket", "field", "term", "doc_id")
              ._jdf.queryExecution().executedPlan().toString())
    assert legacy.count("Exchange") == 2, legacy


def test_blocks_single_exchange_plan(spark, pages, tmp_path):
    """write_blocks (round 5): build_blocks(pre_bucket=B) plans ONE
    exchange — the raw posting rows move once; the legacy plan reshuffled
    the compressed payloads a second time."""
    from search_engine_spark.operators.index_build import (load_index,
                                                           write_index)
    from search_engine_spark.operators.wand import build_blocks
    cfg = IndexConfig(**CFG)
    d = str(tmp_path / "ix")
    write_index(pages, d, cfg)
    ix = load_index(spark, d)
    plan = (build_blocks(ix, pre_bucket=cfg.n_buckets)
            .sortWithinPartitions("field", "term", "blk")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan
    legacy = (build_blocks(ix)
              .repartition(cfg.n_buckets, "bucket")
              .sortWithinPartitions("field", "term", "blk")
              ._jdf.queryExecution().executedPlan().toString())
    assert legacy.count("Exchange") == 2, legacy


def test_written_blocks_parity_with_two_shuffle_plan(spark, pages, tmp_path):
    from search_engine_spark.operators.index_build import (load_index,
                                                           write_index)
    from search_engine_spark.operators.wand import write_blocks
    cfg = IndexConfig(**CFG)
    d1, d2 = str(tmp_path / "one"), str(tmp_path / "two")
    write_index(pages, d1, cfg)
    write_index(pages, d2, cfg)
    m1 = write_blocks(load_index(spark, d1), d1)
    os.environ["SE_BLOCKS_TWO_SHUFFLE"] = "1"
    try:
        m2 = write_blocks(load_index(spark, d2), d2)
    finally:
        del os.environ["SE_BLOCKS_TWO_SHUFFLE"]
    for k in ("n_blocks", "n_postings", "n_terms", "payload_bytes",
              "pos_payload_bytes"):
        assert m1[k] == m2[k], k
    a = (spark.read.parquet(os.path.join(d1, "blocks"))
         .orderBy("bucket", "field", "term", "blk").collect())
    b = (spark.read.parquet(os.path.join(d2, "blocks"))
         .orderBy("bucket", "field", "term", "blk").collect())
    assert a == b
    import glob
    f1 = glob.glob(os.path.join(d1, "blocks", "bucket=*", "*.parquet"))
    assert len(f1) == len(
        glob.glob(os.path.join(d1, "blocks", "bucket=*")))


def test_written_index_parity_with_two_shuffle_plan(spark, pages, tmp_path):
    cfg = IndexConfig(**CFG)
    d1, d2 = str(tmp_path / "one"), str(tmp_path / "two")
    m1 = write_index(pages, d1, cfg)
    os.environ["SE_BUILD_TWO_SHUFFLE"] = "1"
    try:
        m2 = write_index(pages, d2, cfg)
    finally:
        del os.environ["SE_BUILD_TWO_SHUFFLE"]
    for k in ("total_docs", "avg_dl", "dl_sum", "n_postings"):
        assert m1[k] == m2[k], k
    a = (spark.read.parquet(os.path.join(d1, "postings"))
         .orderBy("bucket", "field", "term", "doc_id").collect())
    b = (spark.read.parquet(os.path.join(d2, "postings"))
         .orderBy("bucket", "field", "term", "doc_id").collect())
    assert a == b
    # layout invariant both plans must hold: O(buckets) files, not
    # O(tasks × buckets)
    import glob
    f1 = glob.glob(os.path.join(d1, "postings", "bucket=*", "*.parquet"))
    f2 = glob.glob(os.path.join(d2, "postings", "bucket=*", "*.parquet"))
    assert len(f1) == cfg.n_buckets
    assert len(f2) == cfg.n_buckets
