"""Crash-atomicity of the flush's term_stats swap (round-5 soak find).

compact_runs recounts the AFFECTED buckets' dictionary rows and splices
them over the untouched terms. The old rmtree-then-rename swap had a
window where a crash left NO term_stats at all; the replay — seeing no
old table to keep — rebuilt it from the affected-bucket recount alone,
silently dropping every untouched term's df row. Docs stopped matching,
because the scorer inner-joins the dictionary. Found by
tools/soak_lifecycle.py (seed 1, crash mode); the swap now runs the
_swap_table staging → .compact → live protocol and compact_runs /
load_index recover an interrupted swap before reading.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import (IndexConfig,
                                                       load_index,
                                                       write_index)
from search_engine_spark.operators.lsm import append_docs, compact_runs
from search_engine_spark.plans.dsl import SparkSearchEngine


class Boom(Exception):
    pass


def _mk(spark, tmp_path):
    """Base corpus with vocabulary spread across many buckets + one
    narrow-vocab appended run (so the flush's affected-bucket set leaves
    most dictionary buckets untouched)."""
    d = str(tmp_path / "ix")
    docs = spark.createDataFrame(
        [(i, f"alpha shared u{i}") for i in range(24)],
        "doc_id long, text string")
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"},
                      n_buckets=16)
    write_index(docs, d, cfg)
    run = spark.createDataFrame(
        [(100 + i, "zzznarrow qqqrare") for i in range(4)],
        "doc_id long, text string")
    append_docs(run, d, cfg)
    return d, cfg, docs


@pytest.mark.parametrize("crash_at", [1, 2, 3])
def test_crash_at_each_term_stats_swap_rename(spark, tmp_path,
                                              monkeypatch, crash_at):
    """Crash at the k-th os.rename touching the term_stats table during
    the flush, then REPLAY: every base term must still resolve (df row
    present, term query finds its doc)."""
    d, cfg, docs = _mk(spark, tmp_path)
    calls = {"n": 0}
    orig = os.rename

    def crashing(src, dst):
        if "term_stats" in str(src) or "term_stats" in str(dst):
            calls["n"] += 1
            if calls["n"] == crash_at:
                raise Boom()
        return orig(src, dst)

    monkeypatch.setattr(os, "rename", crashing)
    try:
        compact_runs(spark, d)
        crashed = False
    except Boom:
        crashed = True
    monkeypatch.setattr(os, "rename", orig)
    if not crashed:
        pytest.skip(f"swap used fewer than {crash_at} renames")
    compact_runs(spark, d)  # replay

    idx = load_index(spark, d)
    # the dictionary covers the FULL post-flush postings table
    want = (idx.postings.select("field", "term").distinct())
    missing = want.join(idx.term_stats, ["field", "term"], "anti")
    assert missing.count() == 0, \
        [r["term"] for r in missing.collect()]
    # and an untouched-bucket term still MATCHES through the scorer
    eng = SparkSearchEngine(idx, docs)
    got = eng.search({"term": {"field": "text", "value": "u9"}},
                     size=5).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 9


def test_reader_recovers_mid_swap_absence(spark, tmp_path):
    """A crash that leaves term_stats absent but `.compact` staged must
    be repaired by load_index before any read."""
    import shutil
    d, cfg, docs = _mk(spark, tmp_path)
    compact_runs(spark, d)
    ts = os.path.join(d, "term_stats")
    # simulate the mid-swap state: committed .compact, live absent
    shutil.copytree(ts, ts + ".compact")
    shutil.rmtree(ts)
    idx = load_index(spark, d)
    assert idx.term_stats is not None
    assert not os.path.isdir(ts + ".compact")
    eng = SparkSearchEngine(idx, docs)
    got = eng.search({"term": {"field": "text", "value": "u9"}},
                     size=5).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 9
