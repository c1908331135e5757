"""Crash-atomicity of the delete compaction's table swaps.

compact_deletes used to rmtree the live POSTINGS/DOC_STATS dir before
renaming the rewrite in — a crash in between left the index unreadable
(PATH_NOT_FOUND on replay; crash-injection soak seed 8). The swap is now
staged (``.staging`` → ``.compact`` commit marker → one rename), and
``recover_interrupted_compaction`` (run at compact_deletes entry and by
load_index when a table dir is missing) completes or discards any
interrupted state. The sweep below crashes the compaction at EVERY
Python-side file operation in turn and asserts the index recovers."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from search_engine_spark.operators.delete import (compact_deletes,
                                                  delete_docs,
                                                  load_index_with_deletes)
from search_engine_spark.operators.index_build import (IndexConfig,
                                                       load_index,
                                                       write_index)

CFG = dict(id_col="doc_id", fields={"text": "text"}, n_buckets=4)


def _build(spark, root):
    docs = spark.createDataFrame(
        [(i, f"alpha shared body{i}") for i in range(8)],
        "doc_id long, text string")
    ixdir = os.path.join(root, "ix")
    write_index(docs, ixdir, IndexConfig(**CFG))
    delete_docs(spark, ixdir, [2, 5])
    return ixdir


def test_crash_point_sweep_compact_deletes(spark, tmp_path):
    from soak_lifecycle import InjectedCrash, _FaultInjector
    crashed_at = []
    k = 1
    while True:
        ixdir = _build(spark, str(tmp_path / f"k{k}"))
        try:
            with _FaultInjector(k):
                compact_deletes(spark, ixdir)
            break  # k exceeded the op's file-op count: sweep complete
        except InjectedCrash:
            crashed_at.append(k)
        # the index must stay READABLE after the crash (recovery at load)
        idx = load_index_with_deletes(spark, ixdir)
        assert idx.doc_stats.count() == 6, f"crash@{k}: wrong live count"
        # and the replay must complete and converge
        compact_deletes(spark, ixdir)
        idx = load_index(spark, ixdir)
        assert idx.doc_stats.count() == 6, f"crash@{k}: replay diverged"
        assert idx.postings.where("doc_id in (2, 5)").count() == 0, \
            f"crash@{k}: tombstoned rows survived the replay"
        k += 1
        assert k < 40, "compaction makes more file ops than expected"
    assert len(crashed_at) >= 5, (crashed_at,
                                  "sweep never hit the swap windows")


def test_load_index_recovers_mid_swap_state(spark, tmp_path):
    import shutil
    ixdir = _build(spark, str(tmp_path))
    # construct the worst state: live POSTINGS absent, committed .compact
    # present (crash between the two renames of _swap_table)
    shutil.move(os.path.join(ixdir, "postings"),
                os.path.join(ixdir, "postings.compact"))
    idx = load_index(spark, ixdir)
    assert idx.postings.count() > 0
    assert os.path.isdir(os.path.join(ixdir, "postings"))
    assert not os.path.isdir(os.path.join(ixdir, "postings.compact"))
