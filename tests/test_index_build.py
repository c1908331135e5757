"""Index build parity vs the oracle: postings keys, tf, positions, doc
lengths, collection stats; persisted write/load roundtrip."""

from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import (IndexConfig,
                                                       build_index,
                                                       load_index,
                                                       write_index)


def _spark_postings(ix):
    return {(r["field"], r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
            for r in ix.postings.collect()}


def _oracle_postings(oix):
    out = {}
    for (f, t), d in oix.postings.items():
        for doc, ps in d.items():
            out[(f, t, doc)] = (len(ps), sorted(ps))
    return out


def test_postings_match_oracle(docs_index, oracle_engine):
    sp = _spark_postings(docs_index)
    op = _oracle_postings(oracle_engine.ix)
    assert set(sp) == set(op)
    assert sp == op  # tf AND positions identical


def test_collection_stats_match(docs_index, oracle_engine):
    assert docs_index.total_docs == oracle_engine.ix.total_docs
    assert abs(docs_index.avg_dl - oracle_engine.ix.avg_dl) < 1e-12
    dls = {r["doc_id"]: r["dl"] for r in docs_index.doc_stats.collect()}
    assert dls == oracle_engine.ix.doc_lengths


def test_term_stats_df(docs_index, oracle_engine):
    sp = {(r["field"], r["term"]): r["df"]
          for r in docs_index.term_stats.collect()}
    op = {(f, t): len(d) for (f, t), d in oracle_engine.ix.postings.items()}
    assert sp == op


def test_array_field_positions_dedup(spark):
    """Array elements restart positions; addToken dedup means tf counts
    UNIQUE positions (SearchEngine.ts:902-919 + ShardedInvertedIndex dedup)."""
    df = spark.createDataFrame(
        [("d1", ["fast car", "fast boat"])], "id string, features array<string>")
    ix = build_index(df, IndexConfig(id_col="id", fields={"features": "text"}))
    rows = {r["term"]: (r["tf"], list(r["positions"]))
            for r in ix.postings.collect()}
    assert rows["fast"] == (1, [0])      # positions 0 and 0 dedup to {0}
    assert rows["car"] == (1, [1])
    assert rows["boat"] == (1, [1])
    # array tokens are NOT counted in doc length
    assert ix.doc_stats.collect()[0]["dl"] == 0


def test_write_load_roundtrip(tmp_path, spark, docs_df, docs_index):
    cfg = IndexConfig(id_col="id", fields=docs_index.config.fields, n_buckets=8)
    meta = write_index(docs_df, str(tmp_path / "ix"), cfg)
    assert meta["total_docs"] == docs_index.total_docs
    loaded = load_index(spark, str(tmp_path / "ix"))
    assert loaded.total_docs == docs_index.total_docs
    assert abs(loaded.avg_dl - docs_index.avg_dl) < 1e-12
    assert loaded.postings.count() == docs_index.postings.count()
    # bucket partitioning: every row's bucket matches the xxh64 convention
    # (so the driver can compute buckets in pure Python, functions/hashing)
    bad = loaded.postings.where(
        F.col("bucket") != F.pmod(
            F.xxhash64(F.concat_ws(":", F.col("field"), F.col("term"))),
            F.lit(8)).cast("int"))
    assert bad.count() == 0
    # spot-check the Python twin agrees
    from search_engine_spark.operators.index_build import bucket_of
    row = loaded.postings.limit(1).collect()[0]
    assert bucket_of(row["field"], row["term"], 8) == row["bucket"]


def test_xxh64_python_twin_matches_spark(spark):
    """Driver-side bucket pruning depends on bit-parity between
    functions.hashing.xxh64_str and Spark's xxhash64 (seed 42)."""
    import random
    from search_engine_spark.functions.hashing import xxh64_str
    rng = random.Random(11)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789:ümö-愛 "
    vals = ["", "a", "text:za"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 80)))
        for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert xxh64_str(r["s"]) == r["h"], r["s"]
