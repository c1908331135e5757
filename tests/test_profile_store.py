"""ProfileStore: persisted per-user personalization profiles
(PersonalizationEngine.ts addEvent/getBoost/getUserProfile parity)."""

from __future__ import annotations

import os

from search_engine_spark.operators.personalization import (ProfileStore,
                                                           personalize)


def test_add_event_and_boost(spark, tmp_path):
    st = ProfileStore(spark, str(tmp_path / "profiles"))
    assert st.get_boost("u1", 7) == 0
    assert st.get_profile("u1") is None
    st.add_event("u1", 7)
    st.add_event("u1", 7, event_type="view")
    st.add_event("u1", 9)
    st.add_event("u2", 7)
    assert st.get_boost("u1", 7) == 2  # every event type counts
    assert st.get_boost("u1", 9) == 1
    assert st.get_boost("u1", 99) == 0
    assert st.get_boost("u2", 7) == 1
    p = st.get_profile("u1")
    assert p["events"] == {7: 2, 9: 1}


def test_boosts_feed_personalize(spark, tmp_path):
    st = ProfileStore(spark, str(tmp_path / "profiles"))
    for _ in range(3):
        st.add_event("u1", 5)
    scored = spark.createDataFrame([(5, 1.0), (6, 2.0)],
                                   "doc_id long, score double")
    out = {r["doc_id"]: r["score"]
           for r in personalize(scored, st.boosts_for("u1")).collect()}
    assert out == {5: 4.0, 6: 2.0}


def test_compact_preserves_profiles(spark, tmp_path):
    st = ProfileStore(spark, str(tmp_path / "profiles"), n_buckets=2)
    for i in range(6):
        st.add_event("u1", i % 3)
    st.add_event("u9", 42)
    before = st.get_profile("u1")["events"]
    st.compact()
    assert st.get_profile("u1")["events"] == before
    assert st.get_boost("u9", 42) == 1
    # bucket dirs folded to one file each
    for name in os.listdir(st.path):
        if name.startswith("ubucket="):
            files = [f for f in os.listdir(os.path.join(st.path, name))
                     if f.endswith(".parquet")]
            assert len(files) == 1
    # still appendable after compaction
    st.add_event("u1", 0)
    assert st.get_profile("u1")["events"][0] == before[0] + 1
