"""Pytest leg of the exhaustive crash-point sweep.

tools/sweep_crash_points.py enumerates EVERY Python-side file operation
of each maintenance op and crashes there (reader correctness before the
replay, convergence after). The full enumeration takes tens of minutes;
this leg pins a handful of the windows that held real bugs so the suite
guards them: the resolution journal write, the doc-stats purge/promote
region (a doc used to vanish between promotion and the tombstone
shrink), and the post-shrink region."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.mark.parametrize("k", [1, 2, 8, 15, 20])
def test_flush_crash_points(spark, tmp_path, k):
    from soak_lifecycle import InjectedCrash, _FaultInjector
    from sweep_crash_points import build_state, check_state, run_op
    root = str(tmp_path / f"k{k}")
    os.makedirs(root, exist_ok=True)
    svc, ixdir, live = build_state(spark, root)
    try:
        try:
            with _FaultInjector(k):
                run_op(svc, ixdir, "flush")
            check_state(svc, live, f"flush complete (k={k} past the end)")
            return
        except InjectedCrash:
            pass
        from search_engine_spark.server import SearchService
        svc = SearchService(spark, os.path.join(root, "ix"))
        check_state(svc, live, f"flush crash@{k} pre-replay")
        run_op(svc, ixdir, "flush")
        check_state(svc, live, f"flush crash@{k} post-replay")
    finally:
        shutil.rmtree(root, ignore_errors=True)
