"""Sequence-numbered (barrier) tombstones — the O(batch) upsert design.

Every index row carries a virtual GENERATION: base-table rows are
generation 0, LSM run rows carry their manifest ``seq`` (lsm.with_seq —
a per-run literal, nothing persisted per row in doc_stats; the blocks
and doc_values serving artifacts persist it as ``seq`` / ``__gen``).
A tombstone is (doc_id, barrier): it masks generations with
``seq <= barrier`` — the RocksDB sequence-numbered-delete pattern over
parquet. Delete → re-add therefore needs NO physical rewrite anywhere
(the old escalation ran a full compact_deletes on revival): the re-add
run's seq exceeds the barrier, so its rows are live under the mask every
reader applies, and physical purge defers to the next compaction, which
RESOLVES upsert tombstones (removes them after purging the superseded
rows) and bumps ``meta.resolve_epoch`` so immutable block snapshots that
relied on the removed mask are refused until a bucket-scoped refresh.

Reference parity: QueryEngine.ts:137-149 (add() is an upsert).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.delete import (delete_docs,
                                                  load_dead_ids,
                                                  load_index_with_deletes,
                                                  load_tombstones)
from search_engine_spark.operators.index_build import (META, POSTINGS,
                                                       IndexConfig,
                                                       write_index)
from search_engine_spark.operators.lsm import append_docs, compact_runs
from search_engine_spark.operators.wand import (check_blocks_fresh,
                                                load_blocks, refresh_blocks,
                                                wand_topk, write_blocks)
from search_engine_spark.plans.dsl import SparkSearchEngine
from search_engine_spark.serving import ServingIndex

CFG = dict(id_col="doc_id", fields={"text": "text"}, n_buckets=8)


def _docs(spark, n=30):
    rows = [(i, f"alpha old{i} tok{i % 5}", "en") for i in range(n)]
    return spark.createDataFrame(rows,
                                 "doc_id long, text string, lang string")


def _snapshot_files(d):
    out = []
    for root, _, files in os.walk(d):
        for f in sorted(files):
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out.append((p, st.st_mtime_ns, st.st_size))
    return out


def _members(spark, ixdir, term, docs):
    idx = load_index_with_deletes(spark, ixdir)
    eng = SparkSearchEngine(idx, docs)
    return sorted(r["doc_id"] for r in eng.candidates(
        {"term": {"field": "text", "value": term}}).collect())


def test_revival_rewrites_nothing(spark, tmp_path):
    """delete → re-add touches ZERO base postings files — the revived
    generation rides the append run and the barrier mask, exactly like a
    steady-state append (the old design escalated to a full purge)."""
    ixdir = str(tmp_path / "ix")
    write_index(_docs(spark), ixdir, IndexConfig(**CFG))
    before = _snapshot_files(os.path.join(ixdir, POSTINGS))

    delete_docs(spark, ixdir, [5])
    readd = spark.createDataFrame(
        [(5, "alpha reborn five", "en")],
        "doc_id long, text string, lang string")
    append_docs(readd, ixdir, IndexConfig(**CFG))

    assert _snapshot_files(os.path.join(ixdir, POSTINGS)) == before
    # the tombstone SURVIVES the revival (it still masks generation 0)
    tomb = load_tombstones(spark, ixdir)
    assert [r["doc_id"] for r in tomb.collect()] == [5]
    # …but the doc is NOT dead: its run generation out-survives the barrier
    assert load_dead_ids(spark, ixdir).count() == 0

    docs = _docs(spark)
    assert _members(spark, ixdir, "reborn", docs) == [5]
    assert _members(spark, ixdir, "old5", docs) == []
    meta = json.load(open(os.path.join(ixdir, META)))
    assert meta["total_docs"] == 30


def test_legacy_dir_tombstone_readd_still_revives(spark, tmp_path):
    """Migration: a tombstone written by the pre-barrier layout (append
    dir, mask-ALL sentinel barrier) would swallow the re-add run's
    generation too — append_docs lowers it to the current clock first
    (safe: the legacy invariant guaranteed no live generation), so
    delete → re-add keeps working across the layout change."""
    ixdir = str(tmp_path / "ix")
    write_index(_docs(spark), ixdir, IndexConfig(**CFG))
    # legacy layout: plain doc_id parquet dir, no barrier column
    spark.createDataFrame([(6,)], "doc_id long").write.parquet(
        os.path.join(ixdir, "tombstones"))

    docs = _docs(spark)
    assert _members(spark, ixdir, "old6", docs) == []
    readd = spark.createDataFrame(
        [(6, "alpha revenant six", "en")],
        "doc_id long, text string, lang string")
    append_docs(readd, ixdir, IndexConfig(**CFG))

    assert _members(spark, ixdir, "revenant", docs) == [6]
    assert _members(spark, ixdir, "old6", docs) == []
    # the legacy dir was folded into the crash-atomic barrier file
    assert not os.path.isdir(os.path.join(ixdir, "tombstones"))
    t = load_tombstones(spark, ixdir).collect()
    assert [(r["doc_id"],) for r in t] == [(6,)]
    from search_engine_spark.operators.delete import LEGACY_BARRIER
    assert t[0]["barrier"] < LEGACY_BARRIER


def test_midgeneration_masked_then_resolved_by_flush(spark, tmp_path):
    """Upsert the same doc twice before any flush: only the NEWEST
    generation serves (the mid-generation run is masked by the second
    barrier). compact_runs then RESOLVES: superseded rows are physically
    purged, the tombstone disappears, resolve_epoch bumps, and results
    are unchanged."""
    ixdir = str(tmp_path / "ix")
    write_index(_docs(spark), ixdir, IndexConfig(**CFG))

    def upsert(text):
        delete_docs(spark, ixdir, [3])
        batch = spark.createDataFrame(
            [(3, text, "en")], "doc_id long, text string, lang string")
        append_docs(batch, ixdir, IndexConfig(**CFG))

    upsert("alpha second wave")
    upsert("alpha third wave")

    docs = _docs(spark)
    assert _members(spark, ixdir, "third", docs) == [3]
    assert _members(spark, ixdir, "second", docs) == []
    assert _members(spark, ixdir, "old3", docs) == []

    meta = compact_runs(spark, ixdir)
    # resolution: the upsert tombstone is gone, the epoch moved
    assert load_tombstones(spark, ixdir) is None
    assert meta["resolve_epoch"] == 1
    assert meta["resolve_events"][-1]["epoch"] == 1
    # the superseded generations were PHYSICALLY purged from the base
    base = spark.read.parquet(os.path.join(ixdir, POSTINGS))
    terms = sorted(r["term"] for r in base.where(F.col("doc_id") == 3)
                   .select("term").distinct().collect())
    assert terms == ["alpha", "third", "wave"]
    # and doc_stats holds exactly one row for the doc
    from search_engine_spark.operators.index_build import DOC_STATS
    ds = spark.read.parquet(os.path.join(ixdir, DOC_STATS))
    assert ds.where(F.col("doc_id") == 3).count() == 1
    assert _members(spark, ixdir, "third", docs) == [3]
    assert _members(spark, ixdir, "second", docs) == []
    assert json.load(open(os.path.join(ixdir, META)))["total_docs"] == 30


def test_resolution_staleness_guards_block_snapshot(spark, tmp_path):
    """A block snapshot whose superseded payload segments relied on an
    upsert tombstone must be REFUSED once a flush resolves (removes) that
    tombstone — serving it would unmask BOTH generations and double-count
    the doc. refresh_blocks then rebuilds only the affected buckets."""
    ixdir = str(tmp_path / "ix")
    write_index(_docs(spark), ixdir, IndexConfig(**CFG))
    from search_engine_spark.operators.index_build import load_index
    write_blocks(load_index(spark, ixdir), ixdir)

    delete_docs(spark, ixdir, [4])
    batch = spark.createDataFrame(
        [(4, "alpha fourth rises", "en")],
        "doc_id long, text string, lang string")
    append_docs(batch, ixdir, IndexConfig(**CFG))
    refresh_blocks(spark, ixdir)  # install the revival run's delta

    # pre-flush: blocks mask the old generation, serve the new one
    srv = ServingIndex(ixdir)
    assert 4 in srv.postings("text", "fourth")[0].tolist()
    assert 4 not in srv.postings("text", "old4")[0].tolist()
    # 'alpha' holds BOTH generations of doc 4 — the mask must leave one
    docs_alpha = srv.postings("text", "alpha")[0].tolist()
    assert docs_alpha.count(4) == 1

    compact_runs(spark, ixdir)  # resolves the upsert tombstone
    bm = json.load(open(os.path.join(ixdir, "blocks_meta.json")))
    with pytest.raises(ValueError, match="resolve"):
        check_blocks_fresh(ixdir, bm, "test")
    with pytest.raises(ValueError):
        ServingIndex(ixdir)

    before = {
        name: _snapshot_files(os.path.join(ixdir, "blocks", name))
        for name in os.listdir(os.path.join(ixdir, "blocks"))
        if name.startswith("bucket=")}
    bm2 = refresh_blocks(spark, ixdir)
    assert bm2["resolve_epoch"] == 1
    after = {
        name: _snapshot_files(os.path.join(ixdir, "blocks", name))
        for name in os.listdir(os.path.join(ixdir, "blocks"))
        if name.startswith("bucket=")}
    # bucket-scoped: at least one untouched bucket survives byte-identical
    untouched = [n for n in before if before[n] == after.get(n)]
    assert untouched, "refresh rebuilt every bucket — not bucket-scoped"

    srv = ServingIndex(ixdir)
    assert srv.postings("text", "alpha")[0].tolist().count(4) == 1
    assert 4 in srv.postings("text", "fourth")[0].tolist()
    assert 4 not in srv.postings("text", "old4")[0].tolist()


def test_wand_topk_masks_superseded_generation(spark, tmp_path):
    ixdir = str(tmp_path / "ix")
    write_index(_docs(spark), ixdir, IndexConfig(**CFG))
    delete_docs(spark, ixdir, [2])
    batch = spark.createDataFrame(
        [(2, "alpha encore two", "en")],
        "doc_id long, text string, lang string")
    append_docs(batch, ixdir, IndexConfig(**CFG))
    from search_engine_spark.operators.index_build import load_index
    write_blocks(load_index(spark, ixdir), ixdir)

    idx = load_index_with_deletes(spark, ixdir)
    blocks = load_blocks(spark, ixdir)
    got = [r["doc_id"] for r in
           wand_topk(blocks, idx, "text", ["encore"], k=5).collect()]
    assert got == [2]
    got_old = [r["doc_id"] for r in
               wand_topk(blocks, idx, "text", ["old2"], k=5).collect()]
    assert got_old == []
    # both generations of doc 2 contain 'alpha' — exactly one may score
    got_alpha = [r["doc_id"] for r in
                 wand_topk(blocks, idx, "text", ["alpha"], k=30).collect()]
    assert got_alpha.count(2) == 1 and len(set(got_alpha)) == 30


def test_serving_registry_and_sidecar_take_newest_generation(spark, tmp_path):
    """_all_doc_ids keeps a revived doc exactly once, and the doc-values
    sidecar serves the NEW generation's stored fields after an
    incremental refresh (the superseded row is __gen-masked)."""
    ixdir = str(tmp_path / "ix")
    write_index(_docs(spark), ixdir, IndexConfig(**CFG))
    from search_engine_spark.operators.doc_values import (
        refresh_doc_values, write_doc_values)
    from search_engine_spark.operators.index_build import load_index
    write_blocks(load_index(spark, ixdir), ixdir)
    write_doc_values(_docs(spark), ixdir, ["text", "lang"],
                     includes_runs=[])

    delete_docs(spark, ixdir, [9])
    batch = spark.createDataFrame(
        [(9, "alpha nine lives", "fr")],
        "doc_id long, text string, lang string")
    append_docs(batch, ixdir, IndexConfig(**CFG))
    # docs_runs is the value source for the sidecar delta (server layout)
    os.makedirs(os.path.join(ixdir, "docs_runs"), exist_ok=True)
    from search_engine_spark.operators.lsm import live_runs
    run_key = os.path.basename(live_runs(ixdir)[0]["run_path"])
    batch.coalesce(1).write.parquet(
        os.path.join(ixdir, "docs_runs", run_key))
    refresh_blocks(spark, ixdir)
    refresh_doc_values(spark, ixdir)

    srv = ServingIndex(ixdir)
    ids = srv._all_doc_ids().tolist()
    assert ids.count(9) == 1 and len(ids) == 30
    assert srv.enrich([9], ["text", "lang"])[0] == {
        "text": "alpha nine lives", "lang": "fr"}
    # aggregation must count the doc ONCE, under its new value
    agg = srv.aggregate({"langs": {"terms": {"field": "lang"}}}, None)
    buckets = {b["key"]: b["doc_count"]
               for b in agg["langs"]["buckets"]}
    assert buckets == {"en": 29, "fr": 1}
