"""Frame-native mutation ids (round-4 verdict "What's wrong #2").

delete_docs / upsert_docs accept an id DATAFRAME end to end: the ids flow
source frame → fold → tombstone file as Spark jobs, with no driver-side
id list, no In-expression plans, and no hard tombstone cap — a 100k-id
mutation is just a bigger write. The tombstone table itself is written
by Spark (coalesce(1) staging + os.replace promote), preserving the
single-file crash-atomic layout every reader and the crash sweeps pin.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.delete import (delete_docs,
                                                  load_index_with_deletes)
from search_engine_spark.operators.index_build import (IndexConfig,
                                                       write_index)
from search_engine_spark.operators.lsm import upsert_docs

N_DOCS = 120_000
N_DEL = 100_000


@pytest.fixture(scope="module")
def big_ix(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bigix") / "ix")
    docs = (spark.range(N_DOCS)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("alpha tok"),
                             (F.col("id") % 97).cast("string"))
                    .alias("text")))
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                      n_buckets=4)
    write_index(docs, d, cfg)
    return d, cfg


def _collect_guard(monkeypatch, cap=2_000):
    """Record every DataFrame.collect()/toPandas() row count during the
    guarded block; fail the test if any returns more than ``cap`` rows —
    the direct 'no driver id list' assertion (stats rows and bucket
    lists are tiny; an id list would be 100k)."""
    # patch the CONCRETE class: in PySpark 4 pyspark.sql.DataFrame is a
    # facade and instances are classic.dataframe.DataFrame, whose own
    # methods shadow anything patched onto the parent
    from pyspark.sql.classic.dataframe import DataFrame as CDF
    sizes = []
    orig_collect = CDF.collect
    orig_topandas = CDF.toPandas

    def collect(self):
        out = orig_collect(self)
        sizes.append(len(out))
        return out

    def topandas(self):
        out = orig_topandas(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(CDF, "collect", collect)
    monkeypatch.setattr(CDF, "toPandas", topandas)
    return sizes, cap


def test_delete_100k_ids_frame_native(spark, big_ix, monkeypatch):
    d, cfg = big_ix
    ids = spark.range(N_DEL).select(F.col("id").alias("doc_id"))
    sizes, cap = _collect_guard(monkeypatch)
    meta = delete_docs(spark, d, ids)
    assert sizes and max(sizes) <= cap, f"driver materialized {max(sizes)} rows"
    assert meta["total_docs"] == N_DOCS - N_DEL
    assert meta["n_tombstones"] == N_DEL
    # the tombstone table is ONE parquet file holding exactly the frame
    tf = os.path.join(d, "tombstones.parquet")
    assert os.path.isfile(tf)
    assert pq.ParquetFile(tf).metadata.num_rows == N_DEL
    # no In-expression anywhere in the masked read plan: the mask is a
    # broadcast JOIN of the tombstone frame, never an isin literal list
    idx = load_index_with_deletes(spark, d)
    plan = idx.doc_stats._jdf.queryExecution().executedPlan().toString()
    assert " IN (" not in plan, plan[:2000]
    assert idx.doc_stats.count() == N_DOCS - N_DEL
    live = idx.doc_stats.agg(F.min("doc_id").alias("m")).collect()[0]["m"]
    assert live == N_DEL


def test_upsert_100k_ids_frame_native(spark, tmp_path, monkeypatch):
    d = str(tmp_path / "upix")
    n = N_DEL + 5_000
    docs = (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("beta tok"),
                             (F.col("id") % 89).cast("string"))
                    .alias("text")))
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                      n_buckets=4)
    write_index(docs, d, cfg)
    newgen = (spark.range(N_DEL)
              .select(F.col("id").alias("doc_id"),
                      F.concat(F.lit("gamma tok"),
                               (F.col("id") % 89).cast("string"))
                      .alias("text")))
    sizes, cap = _collect_guard(monkeypatch)
    out = upsert_docs(newgen, d, cfg)
    assert sizes and max(sizes) <= cap, f"driver materialized {max(sizes)} rows"
    assert out["replaced"] == N_DEL and out["added"] == 0
    idx = load_index_with_deletes(spark, d)
    assert idx.doc_stats.count() == n  # replaced, not duplicated
    # the new generation serves; the old one is masked
    assert idx.postings.where(
        (F.col("term") == "gamma") & (F.col("field") == "text")
    ).count() == N_DEL
    assert idx.postings.where(
        (F.col("term") == "beta") & (F.col("field") == "text")
    ).count() == n - N_DEL


def test_delete_frame_equals_list_path(spark, tmp_path):
    d = str(tmp_path / "eqix")
    docs = spark.createDataFrame(
        [(i, f"alpha body{i}") for i in range(8)],
        "doc_id long, text string")
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                      n_buckets=2)
    write_index(docs, d, cfg)
    ids = spark.createDataFrame([(1,), (3,), (5,)], "doc_id long")
    meta = delete_docs(spark, d, ids)
    assert meta["total_docs"] == 5 and meta["n_tombstones"] == 3
    idx = load_index_with_deletes(spark, d)
    assert sorted(r["doc_id"] for r in
                  idx.doc_stats.select("doc_id").collect()) == \
        [0, 2, 4, 6, 7]


def test_delete_frame_rejects_non_numeric_ids(spark, tmp_path):
    d = str(tmp_path / "badix")
    docs = spark.createDataFrame([(1, "alpha one")],
                                 "doc_id long, text string")
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                      n_buckets=2)
    write_index(docs, d, cfg)
    bad = spark.createDataFrame([("x1",)], "doc_id string")
    with pytest.raises(ValueError, match="long-castable"):
        delete_docs(spark, d, bad)


def test_wand_routes_to_exhaustive_above_threshold(spark, tmp_path,
                                                   monkeypatch):
    """Above the kernel-broadcast threshold wand_topk must SERVE (from
    the distributed exhaustive plan, identical scores), never raise."""
    from search_engine_spark.operators import wand as wand_mod
    from search_engine_spark.operators.wand import build_blocks, wand_topk
    d = str(tmp_path / "wix")
    docs = spark.createDataFrame(
        [(i, "data query " + ("data " * (i % 3)) + f"pad{i}")
         for i in range(40)],
        "doc_id long, text string")
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                      n_buckets=2)
    write_index(docs, d, cfg)
    delete_docs(spark, d, [0, 7, 13])
    idx = load_index_with_deletes(spark, d)
    blocks = build_blocks(idx)
    want = [(r["doc_id"], round(r["score"], 6)) for r in
            wand_topk(blocks, idx, "text", ["data", "query"], k=10)
            .collect()]
    monkeypatch.setattr(wand_mod, "MAX_TOMBSTONES_FOR_WAND", 1)
    got = [(r["doc_id"], round(r["score"], 6)) for r in
           wand_topk(blocks, idx, "text", ["data", "query"], k=10)
           .collect()]
    assert got == want
