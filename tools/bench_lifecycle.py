"""Serving-artifact lifecycle costs at bench scale (round 4 evidence).

Measures, on a BENCH_PAGES-page index (default 100k, 64 buckets):

1. covered-flush: append 1k docs, refresh (deltas), THEN flush —
   asserting the snapshot stays fresh with zero blocks I/O (the
   auto-persistence ordering; compaction moves rows only between
   row-store tables the blocks never read);
2. uncovered-flush, natural batch: append 1k synthetic pages, flush
   BEFORE any snapshot, then time the bucket-scoped refresh and report
   how many partitions it rebuilt (a web batch's vocabulary hashes into
   most buckets — the rebuild is bounded by touched VOLUME, not magic);
3. uncovered-flush, narrow batch: same, with a 3-term vocabulary batch
   — the partition-pruned case (rebuilds only those terms' buckets);
4. full write_blocks for comparison.

Usage: python tools/bench_lifecycle.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from search_engine_spark.operators.index_build import (IndexConfig,  # noqa: E402
                                                       load_index,
                                                       write_index)
from search_engine_spark.operators.lsm import append_docs, compact_runs  # noqa: E402
from search_engine_spark.operators.wand import refresh_blocks, write_blocks  # noqa: E402
from search_engine_spark.serving import ServingIndex  # noqa: E402
from search_engine_spark.session import get_spark  # noqa: E402
from search_engine_spark.sources.synth import synth_pages  # noqa: E402


def _build(spark, n_pages, workdir):
    ixdir = os.path.join(workdir, "ix")
    pages = synth_pages(spark, n_pages, partitions=32).cache()
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                      n_buckets=64)
    write_index(pages, ixdir, cfg)
    write_blocks(load_index(spark, ixdir), ixdir)
    return ixdir, cfg


def _batch(spark, n_pages, n=1000):
    return (synth_pages(spark, n, partitions=4)
            .withColumn("doc_id", F.col("doc_id") + F.lit(n_pages)))


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_pages = int(os.environ.get("BENCH_PAGES", "100000"))
    spark = get_spark("bench-lifecycle", cores=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_pages": n_pages, "cpus": cpus, "n_buckets": 64}
    work = tempfile.mkdtemp(prefix="se_lifecycle_")
    try:
        # scenario 1: covered flush — zero blocks work
        ixdir, cfg = _build(spark, n_pages, work)
        append_docs(_batch(spark, n_pages), ixdir, cfg)
        t0 = time.time()
        refresh_blocks(spark, ixdir)
        out["delta_refresh_1k_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        compact_runs(spark, ixdir)
        out["flush_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        bm = refresh_blocks(spark, ixdir)  # must be a no-op
        out["covered_flush_refresh_s"] = round(time.time() - t0, 3)
        srv = ServingIndex(ixdir)          # fresh, no STALE raise
        assert srv.search_with_total({"match_all": {}},
                                     k=1)[1] == n_pages + 1000

        # scenario 2: uncovered flush, natural-vocabulary batch
        append_docs(_batch(spark, n_pages + 1000), ixdir, cfg)
        compact_runs(spark, ixdir)
        t0 = time.time()
        bm = refresh_blocks(spark, ixdir)
        out["uncovered_flush_refresh_natural_s"] = round(
            time.time() - t0, 3)
        out["natural_rebuilt_buckets"] = len(
            bm["last_refresh"]["rebuilt_buckets"])

        # scenario 3: uncovered flush, narrow-vocabulary batch
        rows = [(n_pages + 2000 + i, "zzznarrow qqqrare pppscoped")
                for i in range(1000)]
        narrow = spark.createDataFrame(
            rows, "doc_id long, text string")
        append_docs(narrow, ixdir, cfg)
        compact_runs(spark, ixdir)
        t0 = time.time()
        bm = refresh_blocks(spark, ixdir)
        out["uncovered_flush_refresh_narrow_s"] = round(
            time.time() - t0, 3)
        out["narrow_rebuilt_buckets"] = len(
            bm["last_refresh"]["rebuilt_buckets"])
        srv = ServingIndex(ixdir)
        assert srv.search_with_total({"match_all": {}},
                                     k=1)[1] == n_pages + 3000

        # comparison: the full O(index) rebuild this replaces
        t0 = time.time()
        write_blocks(load_index(spark, ixdir), ixdir)
        out["full_write_blocks_s"] = round(time.time() - t0, 3)

        # scenario 4: delta accumulation vs consolidation — cold term
        # lookup cost with K delta files per bucket, then after the
        # file-level merge (consolidate_blocks)
        from search_engine_spark.operators.wand import consolidate_blocks
        n_runs = 8
        for i in range(n_runs):
            base_id = n_pages + 3000 + i * 100
            batch = (synth_pages(spark, 100, partitions=2)
                     .withColumn("doc_id",
                                 F.col("doc_id") + F.lit(base_id)))
            append_docs(batch, ixdir, cfg)
            refresh_blocks(spark, ixdir)

        import numpy as np
        s0 = ServingIndex(ixdir)
        terms, dfs = s0._dictionary("text")
        order = np.argsort(dfs)
        probes = [str(terms[order[len(order) // 2 + j * 7]])
                  for j in range(5)]

        def cold_p50():
            lat = []
            for t in probes:
                s = ServingIndex(ixdir)  # fresh instance: cold caches
                t0 = time.time()
                s.topk("text", [t], k=10)
                lat.append(time.time() - t0)
            return round(sorted(lat)[len(lat) // 2] * 1000, 2)

        out["cold_topk_p50_ms_8deltas"] = cold_p50()
        t0 = time.time()
        cons = consolidate_blocks(spark, ixdir, min_files=4)
        out["consolidate_blocks_s"] = round(time.time() - t0, 3)
        out["consolidated_buckets"] = len(cons["consolidated_buckets"])
        out["files_removed"] = cons["files_removed"]
        out["cold_topk_p50_ms_consolidated"] = cold_p50()

        # scenario 5: delete -> re-add revival costs (upsert parity).
        # Escalation (re-add of a STILL-tombstoned id) pays one
        # compact_deletes = O(index), by design only on actual revival;
        # re-add of an already-purged id is an O(batch) mask rewrite.
        from search_engine_spark.operators.delete import (compact_deletes,
                                                          delete_docs)
        t0 = time.time()
        append_docs(_batch(spark, n_pages + 50000), ixdir, cfg)
        out["append_1k_baseline_s"] = round(time.time() - t0, 3)
        delete_docs(spark, ixdir, [0, 1])
        revive = spark.createDataFrame(
            [(0, "alpha revived zero")], "doc_id long, text string")
        t0 = time.time()
        append_docs(revive, ixdir, cfg)   # escalates: compact_deletes
        out["readd_tombstoned_escalation_s"] = round(time.time() - t0, 3)
        revive2 = spark.createDataFrame(
            [(1, "alpha revived one")], "doc_id long, text string")
        t0 = time.time()
        append_docs(revive2, ixdir, cfg)  # purged id: unmask, O(batch)
        out["readd_purged_unmask_s"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
