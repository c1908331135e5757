"""Posting-block codec roundtrip + block-max WAND rank-identity.

WAND is safe-up-to-k: its top-k must be IDENTICAL (docs and bitwise scores)
to the exhaustive DataFrame scoring path, on both corpora and at different
parallelism, or the pruning is broken.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import IndexConfig, build_index
from search_engine_spark.operators.postings_codec import (
    decode_block, encode_block, varbyte_decode, varbyte_encode)
from search_engine_spark.operators.wand import build_blocks, wand_topk
from search_engine_spark.plans.dsl import SparkSearchEngine
from search_engine_spark.sources.synth import synth_pages


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr), len(vals)), arr)


@given(st.lists(st.tuples(st.integers(min_value=-2**62, max_value=2**62),
                          st.integers(min_value=1, max_value=1000),
                          st.integers(min_value=0, max_value=100000)),
                min_size=1, max_size=200, unique_by=lambda t: t[0]))
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(postings):
    postings.sort()
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    d2, t2, l2 = decode_block(encode_block(docs.view(np.uint64), tfs, dls))
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(l2, dls)


def test_block_roundtrip_empty():
    d, t, l = decode_block(encode_block(np.array([], dtype=np.uint64),
                                        np.array([], dtype=np.int64),
                                        np.array([], dtype=np.int64)))
    assert len(d) == len(t) == len(l) == 0


@pytest.fixture(scope="module")
def pages_index(spark):
    pages = synth_pages(spark, 3000).cache()
    config = IndexConfig(id_col="doc_id", fields={"text": "text"}, n_buckets=4)
    idx = build_index(pages, config)
    idx.postings = idx.postings.cache()
    idx.term_stats = idx.term_stats.cache()
    blocks = build_blocks(idx).cache()
    blocks.count()
    return pages, idx, blocks


def _exhaustive_topk(idx, pages, terms, k=10):
    eng = SparkSearchEngine(idx, pages)
    q = {"bool": {"should": [
        {"term": {"field": "text", "value": t}} for t in terms]}}
    return eng.search(q, size=k).collect()


@pytest.mark.parametrize("terms", [
    ["ba"],                 # likely head term (short Zipf words)
    ["za", "do", "ri"],     # mixed
])
def test_wand_rank_identity(pages_index, terms):
    pages, idx, blocks = pages_index
    vocab = {r["term"] for r in idx.term_stats.limit(100000).collect()}
    terms = [t for t in terms if t in vocab]
    if not terms:
        terms = sorted(vocab)[:3]
    exact = _exhaustive_topk(idx, pages, terms, k=10)
    wand = wand_topk(blocks, idx, "text", terms, k=10).collect()
    assert [r["doc_id"] for r in wand] == [r["doc_id"] for r in exact]
    for w, e in zip(wand, exact):
        assert w["score"] == pytest.approx(e["score"], abs=1e-12)


def test_wand_rank_identity_headterms(pages_index):
    pages, idx, blocks = pages_index
    top = [r["term"] for r in idx.term_stats.orderBy(F.desc("df"))
           .limit(3).collect()]
    exact = _exhaustive_topk(idx, pages, top, k=20)
    wand = wand_topk(blocks, idx, "text", top, k=20).collect()
    assert [r["doc_id"] for r in wand] == [r["doc_id"] for r in exact]


def test_wand_partition_invariance(pages_index):
    pages, idx, blocks = pages_index
    top = [r["term"] for r in idx.term_stats.orderBy(F.desc("df"))
           .limit(2).collect()]
    a = wand_topk(blocks, idx, "text", top, k=10, n_partitions=1).collect()
    b = wand_topk(blocks, idx, "text", top, k=10, n_partitions=13).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
           [(r["doc_id"], r["score"]) for r in b]


def test_wand_unknown_term(pages_index):
    pages, idx, blocks = pages_index
    assert wand_topk(blocks, idx, "text", ["zzznotaterm"], k=5).count() == 0


@given(st.lists(st.lists(st.tuples(st.integers(min_value=-2**62, max_value=2**62),
                                   st.integers(min_value=1, max_value=500),
                                   st.integers(min_value=0, max_value=5000)),
                         min_size=0, max_size=40, unique_by=lambda t: t[0]),
                min_size=0, max_size=20))
@settings(max_examples=60, deadline=None)
def test_decode_blocks_batch_equals_per_block(blocks):
    from search_engine_spark.operators.postings_codec import (
        decode_blocks_batch, encode_block)
    payloads, want_d, want_t, want_l = [], [], [], []
    for postings in blocks:
        postings.sort()
        d = np.array([p[0] for p in postings], dtype=np.int64)
        t = np.array([p[1] for p in postings], dtype=np.int64)
        l = np.array([p[2] for p in postings], dtype=np.int64)
        payloads.append(encode_block(d.view(np.uint64), t, l))
        want_d.append(d); want_t.append(t); want_l.append(l)
    gd, gt, gl = decode_blocks_batch(payloads)
    cat = lambda xs: (np.concatenate(xs) if xs else np.zeros(0, dtype=np.int64))
    assert np.array_equal(gd, cat(want_d))
    assert np.array_equal(gt, cat(want_t))
    assert np.array_equal(gl, cat(want_l))


def test_head_term_skew_bounded_blocks(spark):
    """Adversarial skew: one term in EVERY doc. Doc-aligned blocking must
    bound every (term, blk) group at BLOCK_BITS capacity — no reducer ever
    materializes a whole head-term posting list."""
    from search_engine_spark.operators.postings_codec import BLOCK_BITS
    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("common filler"),
                 F.lit(" unique"), F.col("id").cast("string")).alias("text"))
    idx = build_index(df, IndexConfig(id_col="doc_id",
                                      fields={"text": "text"}, n_buckets=4))
    blocks = build_blocks(idx)
    row = (blocks.where(F.col("term") == "common")
           .agg(F.max("n_docs").alias("mx"),
                F.count(F.lit(1)).alias("n")).collect()[0])
    assert row["mx"] <= (1 << BLOCK_BITS)
    assert row["n"] >= 5000 // (1 << BLOCK_BITS)  # spread across many groups
