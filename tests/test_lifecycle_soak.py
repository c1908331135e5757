"""Randomized model-checked lifecycle soak (short pytest leg).

One seeded random interleaving of the full mutation mix — append /
upsert / identical re-send / delete / re-add / snapshot / flush /
compact_deletes / consolidate — checked against a Python doc-set model
after every op (tools/soak_lifecycle.py holds the machinery and the
multi-seed deep soak; this pins one seed in the suite so the harness
itself stays green)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_soak_one_seed(spark, tmp_path):
    from soak_lifecycle import run_soak
    trace = run_soak(spark, str(tmp_path), seed=1, n_ops=15)
    assert len(trace) == 15


def test_soak_auto_persist_seed(spark, tmp_path):
    # same machinery with the AutoPersistenceManager policy on: every
    # 3rd appended doc triggers an incremental snapshot refresh, so the
    # interleavings hit refresh-on-append between every mutation kind
    from soak_lifecycle import run_soak
    trace = run_soak(spark, str(tmp_path), seed=2, n_ops=12,
                     auto_persist={"enabled": True, "batch_size": 3})
    assert len(trace) == 12
