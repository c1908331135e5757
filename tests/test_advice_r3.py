"""Regression tests for the round-3 ADVICE items.

1. (high) Index/query analyzer SYMMETRY on stemmed indexes: query tokens go
   through the index's stemmer in term/match/phrase/fuzzy and
   ServingIndex.match — surface forms ('tables', 'running') must hit.
2. (medium) bucket_fn fingerprint validated at load_index / ServingIndex
   time; merge_stream_runs meta carries it (covered via test_streaming's
   load path too).
3. (medium) wand_topk auto-reads the build avg_dl from load_blocks' handle
   so block-max bounds stay safe after deletes without an opt-in param.
4. (low) server clamp floors size from below.
5. (low) detect-mode language detection is per-DOC and PRE-stopword.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import (META, IndexConfig,
                                                       build_index,
                                                       load_index,
                                                       write_index)
from search_engine_spark.plans.dsl import SparkSearchEngine


def _engine(spark, rows, **cfg_kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                      n_buckets=4, **cfg_kw)
    return SparkSearchEngine(build_index(docs, cfg), docs)


SURFACE_ROWS = [
    (0, "the running table is here", "en"),
    (1, "tables run fast", "en"),
    (2, "nothing relevant appears", "en"),
]


class TestQueryStemSymmetry:
    @pytest.fixture(scope="class")
    def eng(self, spark):
        return _engine(spark, SURFACE_ROWS, stem_lang="en")

    def _ids(self, df):
        return sorted(r["doc_id"] for r in df.collect())

    def test_match_surface_form(self, eng):
        got = self._ids(eng.candidates(
            {"match": {"field": "text", "value": "running"}}))
        assert got == [0, 1]  # porter: running->run; doc1 has 'run'

    def test_term_surface_form(self, eng):
        got = self._ids(eng.candidates(
            {"term": {"field": "text", "value": "tables"}}))
        assert got == [0, 1]  # tables->tabl matches stemmed 'table(s)'

    def test_phrase_surface_form(self, eng):
        got = self._ids(eng.candidates(
            {"match_phrase": {"field": "text", "value": "running tables"}}))
        assert got == [0]  # run@1 tabl@2 consecutive only in doc 0

    def test_fuzzy_runs_against_stemmed_dictionary(self, eng):
        got = self._ids(eng.candidates(
            {"fuzzy": {"field": "text", "value": "tablez"}}))
        assert 0 in got and 1 in got  # tablez ~2~ tabl in the stem dictionary

    def test_synonym_expansion_is_stemmed(self, spark):
        docs = spark.createDataFrame(SURFACE_ROWS,
                                     "doc_id long, text string, lang string")
        cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                          n_buckets=4, stem_lang="en")
        eng = SparkSearchEngine(build_index(docs, cfg), docs,
                                synonyms={"irrelevant": ["tables"]})
        got = sorted(r["doc_id"] for r in eng.candidates(
            {"term": {"field": "text", "value": "irrelevant"}}).collect())
        assert got == [0, 1]  # synonym token 'tables' stems to 'tabl'

    def test_detect_mode_query_routing(self, spark):
        # detect-routed index: German docs stem with de; a German surface
        # query with marker words routes to 'de' and stems the same way
        rows = [(0, "der die und das laufenden tabellen hier sind", "de"),
                (1, "der die und das andere inhalte sind hier", "de")]
        eng = _engine(spark, rows, stem_lang="detect")
        got = sorted(r["doc_id"] for r in eng.candidates(
            {"match": {"field": "text",
                       "value": "der die und laufenden"}}).collect())
        assert got == [0]

    def test_unstemmed_index_unchanged(self, spark):
        eng = _engine(spark, SURFACE_ROWS)  # no stem_lang
        got = sorted(r["doc_id"] for r in eng.candidates(
            {"term": {"field": "text", "value": "tables"}}).collect())
        assert got == [1]  # surface semantics untouched


class TestServingStemSymmetry:
    def test_serving_match_stems(self, spark, tmp_path):
        from search_engine_spark.operators.wand import write_blocks
        from search_engine_spark.serving import ServingIndex
        docs = spark.createDataFrame(SURFACE_ROWS,
                                     "doc_id long, text string, lang string")
        cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                          n_buckets=4, stem_lang="en")
        ixdir = str(tmp_path / "ix")
        write_index(docs, ixdir, cfg)
        idx = load_index(spark, ixdir)
        write_blocks(idx, ixdir)
        srv = ServingIndex(ixdir)
        got = sorted(d for d, _ in srv.match("text", "running tables", k=10))
        assert got == [0, 1]  # AND of stems run+tabl
        # parity with the DSL path, scores included
        eng = SparkSearchEngine(idx, docs)
        spark_top = eng.search(
            {"match": {"field": "text", "value": "running tables"}},
            size=10).collect()
        srv_top = srv.match("text", "running tables", k=10)
        assert [r["doc_id"] for r in spark_top] == [d for d, _ in srv_top]
        for r, (_, s) in zip(spark_top, srv_top):
            # JVM ln vs libm log differ by <=1 ulp (see functions/bm25.py)
            assert r["score"] == pytest.approx(s, rel=1e-12)


class TestBucketFnValidation:
    def test_legacy_meta_rejected(self, spark, tmp_path):
        from search_engine_spark.serving import ServingIndex
        docs = spark.createDataFrame(SURFACE_ROWS,
                                     "doc_id long, text string, lang string")
        ixdir = str(tmp_path / "ix")
        write_index(docs, ixdir,
                    IndexConfig(id_col="doc_id", fields={"text": "text"},
                                n_buckets=4))
        load_index(spark, ixdir)  # current fingerprint loads fine
        meta_path = os.path.join(ixdir, META)
        with open(meta_path) as fh:
            meta = json.load(fh)
        meta.pop("bucket_fn")  # legacy layout: no fingerprint
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)
        with pytest.raises(ValueError, match="bucket_fn"):
            load_index(spark, ixdir)
        with pytest.raises(ValueError, match="bucket_fn"):
            ServingIndex(ixdir)

    def test_streaming_meta_carries_bucket_fn(self, spark, tmp_path):
        # merge_stream_runs meta must validate too (it previously omitted
        # bucket_fn, making streaming-built indexes unloadable post-fix)
        from search_engine_spark.streaming.ingest import merge_stream_runs
        from search_engine_spark.operators.index_build import (MANIFEST,
                                                               RUNS,
                                                               build_doc_stats,
                                                               build_postings)
        docs = spark.createDataFrame(SURFACE_ROWS,
                                     "doc_id long, text string, lang string")
        cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                          n_buckets=4)
        ixdir = str(tmp_path / "six")
        os.makedirs(os.path.join(ixdir, MANIFEST))
        run = os.path.join(ixdir, RUNS, "stream_batch=0")
        build_postings(docs, cfg).write.parquet(run)
        dsp = os.path.join(ixdir, RUNS, "doc_stats_stream_batch=0")
        build_doc_stats(docs, cfg).write.parquet(dsp)
        with open(os.path.join(ixdir, MANIFEST, "stream-00000.json"), "w") as fh:
            json.dump({"chunk": "stream_batch=0", "status": "committed",
                       "run_path": run, "doc_stats_path": dsp}, fh)
        meta = merge_stream_runs(spark, ixdir, cfg)
        assert meta["bucket_fn"]
        idx = load_index(spark, ixdir)  # must not raise
        assert idx.total_docs == 3


class TestWandAutoAvgdl:
    def test_auto_scale_after_deletes(self, spark, tmp_path):
        from search_engine_spark.operators.delete import (
            delete_docs, load_index_with_deletes)
        from search_engine_spark.operators.wand import (load_blocks,
                                                        wand_topk,
                                                        write_blocks)
        # short docs (ids 0..19) + long docs; deleting the short ones GROWS
        # avgdl, which is the unsafe direction for stale block-max bounds
        rows = [(i, "alpha beta", "en") for i in range(20)] + \
               [(100 + i, "alpha gamma " + " ".join(["filler"] * 30), "en")
                for i in range(10)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        cfg = IndexConfig(id_col="doc_id", fields={"text": "text"}, n_buckets=4)
        ixdir = str(tmp_path / "wix")
        write_index(docs, ixdir, cfg)
        idx0 = load_index(spark, ixdir)
        write_blocks(idx0, ixdir)
        delete_docs(spark, ixdir, list(range(20)))
        idx = load_index_with_deletes(spark, ixdir)
        blocks = load_blocks(spark, ixdir)
        assert getattr(blocks, "_se_build_avg_dl", None) is not None
        assert blocks._se_build_avg_dl < idx.avg_dl  # avgdl grew
        live_docs = docs.where(F.col("doc_id") >= 100)
        eng = SparkSearchEngine(idx, live_docs)
        exact = eng.search({"bool": {"should": [
            {"term": {"field": "text", "value": "alpha"}},
            {"term": {"field": "text", "value": "gamma"}}]}}, size=5).collect()
        # NO build_avg_dl passed: wand must pick it up from the handle
        wand = wand_topk(blocks, idx, "text", ["alpha", "gamma"], k=5).collect()
        assert [(r["doc_id"], r["score"]) for r in exact] == \
            [(r["doc_id"], r["score"]) for r in wand]


class TestServerClamp:
    def test_size_floored(self):
        from search_engine_spark.server import clamp_options
        assert clamp_options({"size": -5})["size"] == 10
        assert clamp_options({"size": 0})["size"] == 10
        assert clamp_options({"size": 7})["size"] == 7
        assert clamp_options({"size": 10**6})["size"] == 100


class TestDetectPerDocPreStopword:
    def test_stopwords_do_not_bias_detection(self, spark):
        # German function words are BOTH the detector's markers and the
        # configured stopwords: detection must run pre-stopword or every
        # doc routes to the English porter
        rows = [(0, "der die und das laufenden tabellen sind hier", "de")]
        eng = _engine(spark, rows, stem_lang="detect",
                      stopwords=("der", "die", "und", "das", "sind"))
        terms = {r["term"] for r in eng.index.term_stats.collect()}
        assert "laufend" in terms      # de-stemmed
        assert "laufenden" not in terms
        assert "tabell" in terms       # de: tabellen -> tabell
        assert "der" not in terms      # stopwords still filtered from index

    def test_detection_is_per_document_across_fields(self, spark):
        # the short title alone carries no markers; the body does — the
        # whole DOC routes to 'de', so the title's tokens stem with de
        docs = spark.createDataFrame(
            [(0, "laufenden", "der die und das inhalte sind hier lang")],
            "doc_id long, title string, body string")
        cfg = IndexConfig(id_col="doc_id",
                          fields={"title": "text", "body": "text"},
                          n_buckets=4, stem_lang="detect")
        idx = build_index(docs, cfg)
        title_terms = {r["term"] for r in idx.term_stats
                       .where(F.col("field") == "title").collect()}
        assert title_terms == {"laufend"}


class TestScriptLangId:
    def test_python_twin(self):
        from search_engine_spark.functions.textstats import lang_id_py
        assert lang_id_py(["гауа"]) == "ru"
        assert lang_id_py(["αβγδε"]) == "el"
        assert lang_id_py(["der", "die", "und"]) == "de"
        assert lang_id_py(["zzz"]) == "en"
        assert lang_id_py([]) == "en"

    def test_column_twin_agrees(self, spark):
        from search_engine_spark.functions.textstats import lang_id_tokens
        rows = [(["гауа", "бвг"],), (["αβγδε"],), (["der", "die", "und"],),
                (["zzz"],)]
        df = spark.createDataFrame(rows, "toks array<string>")
        got = [r["l"] for r in
               df.select(lang_id_tokens(F.col("toks")).alias("l")).collect()]
        assert got == ["ru", "el", "de", "en"]
