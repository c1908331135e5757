"""Round-2 regression pins for the ADVICE findings: tombstone-aware block
readers, streaming doc_stats parity, exists dotted-path guard, catalog cache
invalidation, codec batch empty rows, and the probe-free bool plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.delete import (delete_docs,
                                                  load_index_with_deletes)
from search_engine_spark.operators.index_build import (IndexConfig,
                                                       write_index)
from search_engine_spark.operators.postings_codec import (encode_block,
                                                          encode_blocks_batch)
from search_engine_spark.operators.wand import (load_blocks, wand_topk,
                                                write_blocks)
from search_engine_spark.plans.dsl import SparkSearchEngine
from search_engine_spark.serving import ServingIndex
from search_engine_spark.sources.synth import synth_pages

CFG = dict(id_col="doc_id", fields={"text": "text"}, n_buckets=4)


# ---------------------------------------------------------------------------
# A5: encode_blocks_batch must be bit-identical to per-row encode_block even
# with empty posting rows anywhere in the batch
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("docs", [
    [[1, 5, 9], [2], []],          # trailing empty
    [[], [1, 2], [7]],             # leading empty
    [[1, 2], [], [7, 8, 300]],     # middle empty
    [[], [], []],                  # all empty
])
def test_codec_batch_empty_rows(docs):
    tfs = [[i + 1 for i in range(len(d))] for d in docs]
    dls = [[10 + i for i in range(len(d))] for d in docs]
    batch = encode_blocks_batch(docs, tfs, dls)
    single = [encode_block(np.array(d, dtype=np.int64),
                           np.array(t, dtype=np.int64),
                           np.array(l, dtype=np.int64))
              for d, t, l in zip(docs, tfs, dls)]
    assert batch == single


# ---------------------------------------------------------------------------
# A3: exists on a nonexistent dotted path returns the empty node (reference
# semantics: no match) instead of raising AnalysisException
# ---------------------------------------------------------------------------

def test_exists_missing_dotted_path_is_empty(spark_engine):
    for field in ["nope.deeper", "nope", "text.not_a_struct", ""]:
        got = spark_engine.candidates({"exists": {"field": field}}).count()
        assert got == 0, field


def test_exists_valid_dotted_path_still_works(spark_engine):
    # docs_df has a nested struct column (meta.tags per synth_docs)
    schema = spark_engine.docs.schema
    nested = [f.name for f in schema.fields
              if f.dataType.typeName() == "struct"]
    if not nested:
        pytest.skip("no struct column in fixture docs")
    sub = schema[nested[0]].dataType.fieldNames()[0]
    path = f"{nested[0]}.{sub}"
    n = spark_engine.candidates({"exists": {"field": path}}).count()
    assert n > 0


# ---------------------------------------------------------------------------
# bool compilation must not run a Spark job (the old _is_empty probe did)
# ---------------------------------------------------------------------------

def test_bool_should_must_compiles_without_job(spark, spark_engine):
    sc = spark.sparkContext
    group = "bool-compile-probe"
    sc.setJobGroup(group, "assert no job during DSL compilation")
    try:
        q = {"bool": {"must": [{"term": {"field": "title", "value": "spark"}}],
                      "should": [{"term": {"field": "title", "value": "query"}},
                                 {"term": {"field": "title", "value": "index"}}],
                      "minimum_should_match": 1}}
        spark_engine.candidates(q)           # compile only — no action
        spark_engine.search_scored(q)        # scoring compile — no action
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup(group)) == []


def test_bool_empty_mandatory_falls_back_to_should(spark_engine):
    """'should replaces empty mandatory results' survives the probe removal."""
    q = {"bool": {
        "must": [{"term": {"field": "content", "value": "zzz_nonexistent"}}],
        "should": [{"term": {"field": "content", "value": "quick"}}]}}
    fallback = {r["doc_id"] for r in spark_engine.candidates(q).collect()}
    direct = {r["doc_id"] for r in spark_engine.candidates(
        {"term": {"field": "content", "value": "quick"}}).collect()}
    assert fallback == direct and fallback


# ---------------------------------------------------------------------------
# A1: serving + wand read paths honor tombstones
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def deleted_index(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("tomb_ix"))
    pages = synth_pages(spark, 300).cache()
    write_index(pages, d, IndexConfig(**CFG))
    idx0 = load_index_with_deletes(spark, d)
    write_blocks(idx0, d)
    doomed = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 42, 150, 299]
    delete_docs(spark, d, doomed)
    idx = load_index_with_deletes(spark, d)
    return d, pages, idx, set(doomed)


def test_serving_excludes_tombstoned_docs(spark, deleted_index):
    d, pages, idx, doomed = deleted_index
    srv = ServingIndex(d)
    eng = SparkSearchEngine(idx, pages)
    term = "za"
    got = srv.topk("text", [term], k=300)
    assert {doc for doc, _ in got}.isdisjoint(doomed)
    # scores bitwise-identical to the post-delete DSL path
    want = {r["doc_id"]: r["score"] for r in eng.search(
        {"term": {"field": "text", "value": term}}, size=300).collect()}
    for doc, score in got:
        assert want[doc] == score, (doc, score, want[doc])
    # df matches the recomputed term_stats
    df_dsl = idx.term_stats.where(
        (F.col("field") == "text") & (F.col("term") == term)
    ).collect()
    want_df = df_dsl[0]["df"] if df_dsl else 0
    assert srv.df("text", term) == want_df


def test_wand_excludes_tombstoned_docs(spark, deleted_index):
    d, pages, idx, doomed = deleted_index
    blocks = load_blocks(spark, d)
    import json
    import os
    with open(os.path.join(d, "blocks_meta.json")) as fh:
        build_avg_dl = json.load(fh)["avg_dl"]
    eng = SparkSearchEngine(idx, pages)
    terms = ["za", "data"]
    got = wand_topk(blocks, idx, "text", terms, k=10,
                    build_avg_dl=build_avg_dl).collect()
    assert {r["doc_id"] for r in got}.isdisjoint(doomed)
    want = eng.search({"bool": {"should": [
        {"term": {"field": "text", "value": t}} for t in terms]}},
        size=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]


# ---------------------------------------------------------------------------
# A4: catalog engine cache must see out-of-band deletes
# ---------------------------------------------------------------------------

def test_catalog_cache_sees_deletes(tmp_path, spark):
    from search_engine_spark.catalog import IndexCatalog
    cat = IndexCatalog(spark, str(tmp_path / "cat"))
    pages = synth_pages(spark, 100).cache()
    cat.create_index("ix", pages, IndexConfig(**CFG))
    before = cat.search(pages, {"match_all": {}}, "ix", size=1000).count()
    assert before == 100
    # out-of-band delete (not through the catalog)
    delete_docs(spark, str(tmp_path / "cat" / "ix"), [0, 1, 2])
    after = cat.search(pages, {"match_all": {}}, "ix", size=1000).count()
    assert after == 97
    # and through the catalog API
    cat.delete_docs("ix", [3])
    assert cat.search(pages, {"match_all": {}}, "ix", size=1000).count() == 96


# ---------------------------------------------------------------------------
# A2: streaming merge doc_stats parity when docs have zero tokens
# ---------------------------------------------------------------------------

def test_stream_merge_dl_parity_with_empty_docs(tmp_path, spark):
    from search_engine_spark.operators.index_build import load_index
    from search_engine_spark.sources.synth import PAGES_SCHEMA
    from search_engine_spark.streaming.ingest import (merge_stream_runs,
                                                      stream_index_runs)
    pages = synth_pages(spark, 60).withColumn(
        "text", F.when(F.col("doc_id") % 10 == 0, F.lit(""))
                 .otherwise(F.col("text"))).cache()
    src = str(tmp_path / "src")
    pages.where(F.col("doc_id") < 30).write.parquet(src + "/a")
    pages.where(F.col("doc_id") >= 30).write.parquet(src + "/b")
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    idx_dir = str(tmp_path / "stream_ix")
    q = stream_index_runs(stream, idx_dir, IndexConfig(**CFG))
    q.awaitTermination(120)
    meta = merge_stream_runs(spark, idx_dir, IndexConfig(**CFG))
    # zero-token docs count toward total_docs with dl=0, like the batch path
    batch_dir = str(tmp_path / "batch_ix")
    bmeta = write_index(pages, batch_dir, IndexConfig(**CFG))
    assert meta["total_docs"] == bmeta["total_docs"] == 60
    assert abs(meta["avg_dl"] - bmeta["avg_dl"]) < 1e-12
    a = load_index(spark, idx_dir)
    sa = dict(a.doc_stats.collect())
    assert sa[0] == 0 and sa[10] == 0
