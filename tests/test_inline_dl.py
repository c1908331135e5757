"""Inline-dl postings (round-4 scale fix): BM25 scoring and the block
build must not shuffle the corpus-sized doc_stats table when every
posting row carries its owning doc's length.

Covers: dl column presence + exactness, join-free plans, bitwise score
parity vs the legacy join path, dl survival through the LSM lifecycle
(append → union view → compaction → delete masking), and mixed-version
artifact alignment (pre-dl base with post-dl runs and the reverse)."""

from __future__ import annotations

import copy
import json
import os
import re

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.delete import (delete_docs,
                                                  load_index_with_deletes)
from search_engine_spark.operators.index_build import (POSTINGS, IndexConfig,
                                                       build_index,
                                                       build_postings,
                                                       load_index,
                                                       write_index)
from search_engine_spark.operators.lsm import append_docs, compact_runs
from search_engine_spark.operators.wand import build_blocks, wand_topk
from search_engine_spark.plans.dsl import SparkSearchEngine

CFG = dict(id_col="doc_id", fields={"text": "text"}, n_buckets=8)

QUERY = {"bool": {"should": [{"match": {"field": "text", "value": "alpha"}},
                             {"match": {"field": "text", "value": "gamma"}}]}}


def _docs(spark, n=60, start=0):
    rows = [(i, f"alpha doc{i % 7} beta" + (" gamma" if i % 3 == 0 else ""),
             "en") for i in range(start, start + n)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _njoins(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Join", plan))


def _scores(engine, q=QUERY):
    return {(r["doc_id"], r["score"])
            for r in engine.search_scored(q).collect()}


class TestInlineDl:
    def test_postings_carry_exact_dl(self, spark):
        ix = build_index(_docs(spark), IndexConfig(**CFG))
        assert "dl" in ix.postings.columns
        bad = (ix.postings.select("doc_id", "dl")
               .join(ix.doc_stats.withColumnRenamed("dl", "ds_dl"), "doc_id")
               .where(F.col("dl") != F.col("ds_dl")).count())
        assert bad == 0

    def test_scoring_plan_join_free_and_bitwise_equal(self, spark):
        docs = _docs(spark)
        ix = build_index(docs, IndexConfig(**CFG))
        legacy = copy.copy(ix)
        legacy.postings = ix.postings.drop("dl")
        e_new = SparkSearchEngine(ix, docs)
        e_old = SparkSearchEngine(legacy, docs)
        # inline path: exactly the broadcast term_stats join remains
        assert _njoins(e_new.search_scored(QUERY)) \
            == _njoins(e_old.search_scored(QUERY)) - 1
        assert _scores(e_new) == _scores(e_old)

    def test_blocks_build_join_free_and_rank_identical(self, spark):
        docs = _docs(spark)
        ix = build_index(docs, IndexConfig(**CFG))
        legacy = copy.copy(ix)
        legacy.postings = ix.postings.drop("dl")
        b_new, b_old = build_blocks(ix), build_blocks(legacy)
        assert _njoins(b_new) == 0 and _njoins(b_old) >= 1
        t_new = [(r[0], r[1]) for r in
                 wand_topk(b_new, ix, "text", ["alpha", "gamma"], 10).collect()]
        t_old = [(r[0], r[1]) for r in
                 wand_topk(b_old, legacy, "text",
                           ["alpha", "gamma"], 10).collect()]
        assert t_new == t_old

    def test_array_field_config_skips_dl(self, spark):
        docs = spark.createDataFrame(
            [(1, ["red blue", "blue"]), (2, ["green"])],
            "doc_id long, tags array<string>")
        p = build_postings(docs, IndexConfig(
            id_col="doc_id", fields={"tags": "keyword"},
            analyzers={"tags": "standard"}), with_dl=True)
        assert "dl" not in p.columns  # positions restart per element


class TestLifecycleKeepsDl:
    @pytest.fixture(scope="class")
    def ixdir(self, spark, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("inline_dl") / "ix")
        write_index(_docs(spark, 40), d, IndexConfig(**CFG))
        append_docs(_docs(spark, 20, start=40), d, IndexConfig(**CFG))
        return d

    def test_union_view_scores_join_free(self, spark, ixdir):
        idx = load_index(spark, ixdir)
        assert "dl" in idx.postings.columns
        docs = _docs(spark, 60)
        eng = SparkSearchEngine(idx, docs)
        oracle_ix = build_index(docs, IndexConfig(**CFG))
        assert _scores(eng) == _scores(SparkSearchEngine(oracle_ix, docs))

    def test_compaction_and_deletes_keep_dl(self, spark, ixdir):
        compact_runs(spark, ixdir)
        base = spark.read.parquet(os.path.join(ixdir, POSTINGS))
        assert "dl" in base.columns
        assert base.where(F.col("dl").isNull()).count() == 0
        delete_docs(spark, ixdir, [3, 57])
        idx = load_index_with_deletes(spark, ixdir)
        live = _docs(spark, 60).where(~F.col("doc_id").isin([3, 57]))
        eng = SparkSearchEngine(idx, live)
        oracle_ix = build_index(live, IndexConfig(**CFG))
        assert _scores(eng) == _scores(SparkSearchEngine(oracle_ix, live))


class TestMixedVersionArtifacts:
    """A pre-dl base with post-dl runs (and the reverse) must still
    union, score, and compact with schema-uniform bucket partitions."""

    def _strip_base_dl(self, spark, ixdir):
        base_dir = os.path.join(ixdir, POSTINGS)
        stripped = spark.read.parquet(base_dir).drop("dl").localCheckpoint()
        (stripped.write.mode("overwrite").partitionBy("bucket")
         .parquet(base_dir + ".tmp"))
        import shutil
        shutil.rmtree(base_dir)
        os.rename(base_dir + ".tmp", base_dir)

    def test_legacy_base_new_runs(self, spark, tmp_path):
        ixdir = str(tmp_path / "ix")
        write_index(_docs(spark, 40), ixdir, IndexConfig(**CFG))
        self._strip_base_dl(spark, ixdir)
        append_docs(_docs(spark, 20, start=40), ixdir, IndexConfig(**CFG))
        idx = load_index(spark, ixdir)
        assert "dl" not in idx.postings.columns  # aligned down
        docs = _docs(spark, 60)
        assert _scores(SparkSearchEngine(idx, docs)) == _scores(
            SparkSearchEngine(build_index(docs, IndexConfig(**CFG)), docs))
        compact_runs(spark, ixdir)
        base = spark.read.parquet(os.path.join(ixdir, POSTINGS))
        assert "dl" not in base.columns  # written buckets match legacy

    def test_new_base_legacy_run(self, spark, tmp_path):
        ixdir = str(tmp_path / "ix")
        cfg = IndexConfig(**CFG)
        write_index(_docs(spark, 40), ixdir, cfg)
        entry = append_docs(_docs(spark, 20, start=40), ixdir, cfg)
        # rewrite the run's postings WITHOUT dl (pre-round-4 writer)
        run = spark.read.parquet(entry["run_path"]).drop("dl") \
            .localCheckpoint()
        run.write.mode("overwrite").parquet(entry["run_path"])
        idx = load_index(spark, ixdir)
        assert "dl" not in idx.postings.columns  # union aligned down
        docs = _docs(spark, 60)
        assert _scores(SparkSearchEngine(idx, docs)) == _scores(
            SparkSearchEngine(build_index(docs, cfg), docs))
        # compaction pins the BASE schema: run dl recovered from the
        # run's doc-stats, every written row non-null
        compact_runs(spark, ixdir)
        base = spark.read.parquet(os.path.join(ixdir, POSTINGS))
        assert "dl" in base.columns
        assert base.where(F.col("dl").isNull()).count() == 0
        idx2 = load_index(spark, ixdir)
        assert _scores(SparkSearchEngine(idx2, docs)) == _scores(
            SparkSearchEngine(build_index(docs, cfg), docs))
