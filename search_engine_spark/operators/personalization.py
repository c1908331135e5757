"""Personalization boost (SURVEY §2.5 S5): additive per-user click counts.

The reference keeps Map<userId, {events: {docId: clickCount}}> and adds the
raw click count to each hit's score (PersonalizationEngine.ts:110-159). On
Spark the profile store IS the events table: boosts are a groupBy over the
user's click events, broadcast-joined onto the scored hits (a single user's
profile is tiny by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_click_boosts(events: DataFrame, user_id: int,
                      doc_id_expr=None,
                      click_type: str = "click") -> DataFrame:
    """(doc_id, clicks) for one user. ``doc_id_expr`` maps an event row to
    the clicked doc id; defaults to the numeric ``k`` prop of the event
    payload (the driver testdata's props format)."""
    if doc_id_expr is None:
        doc_id_expr = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1) \
            .cast("long")
    return (events
            .where((F.col("user_id") == user_id)
                   & (F.col("event_type") == click_type))
            .select(doc_id_expr.alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("clicks")))


def personalize(scored: DataFrame, boosts: DataFrame) -> DataFrame:
    """score + clicks (raw additive boost, PersonalizationEngine.ts:144-159).

    ``scored`` is DataFrame[doc_id, score]; the boost side is broadcast
    (one user's clicks)."""
    return (scored.join(F.broadcast(boosts), "doc_id", "left")
            .select("doc_id",
                    (F.col("score")
                     + F.coalesce(F.col("clicks"), F.lit(0)).cast("double"))
                    .alias("score")))


class ProfileStore:
    """Persisted per-user profile store — the columnar twin of the
    reference's ``userProfiles.json`` map (PersonalizationEngine.ts:48-170
    addEvent/getBoost/getUserProfile/load/save).

    Layout: ``<path>/ubucket=<hash(user) % B>/`` parquet DELTA rows
    (user_id, doc_id, event_type, n, ts). ``add_event`` appends ONE tiny
    file with pyarrow — no Spark job, O(1) per event, the write-path shape
    a click-stream needs. Reads prune to the user's bucket partition, so
    profile lookups stay O(user's events) at any user count; ``compact()``
    folds deltas bucket-by-bucket with a Spark job when file counts grow.
    Boost semantics match the reference: the raw event count for
    (user, doc), 0 when absent.
    """

    def __init__(self, spark, path: str, n_buckets: int = 16):
        import os
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        os.makedirs(path, exist_ok=True)

    def _bucket(self, user_id) -> int:
        from ..functions.hashing import xxh64_str
        return xxh64_str(str(user_id)) % self.n_buckets

    def add_event(self, user_id, doc_id, event_type: str = "click",
                  n: int = 1) -> None:
        """Record an interaction (PersonalizationEngine.addEvent:108-135):
        every event type counts into the profile's per-doc event tally."""
        import os
        import time
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        d = os.path.join(self.path, f"ubucket={self._bucket(user_id)}")
        os.makedirs(d, exist_ok=True)
        t = pa.table({
            "user_id": pa.array([str(user_id)], pa.string()),
            "doc_id": pa.array([int(doc_id)], pa.int64()),
            "event_type": pa.array([str(event_type)], pa.string()),
            "n": pa.array([int(n)], pa.int64()),
            "ts": pa.array([time.time()], pa.float64()),
        })
        pq.write_table(t, os.path.join(d, f"evt-{uuid.uuid4().hex}.parquet"))

    def _user_rows(self, user_id):
        import os

        import pyarrow.dataset as pads
        d = os.path.join(self.path, f"ubucket={self._bucket(user_id)}")
        if not os.path.isdir(d) or not os.listdir(d):
            return None
        ds = pads.dataset(d, format="parquet")
        return ds.to_table(filter=pads.field("user_id") == str(user_id))

    def get_profile(self, user_id) -> dict | None:
        """{doc_id: count} or None (getUserProfile:165-176 shape)."""
        t = self._user_rows(user_id)
        if t is None or t.num_rows == 0:
            return None
        out: dict = {}
        last = 0.0
        for doc, n, ts in zip(t.column("doc_id").to_pylist(),
                              t.column("n").to_pylist(),
                              t.column("ts").to_pylist()):
            out[doc] = out.get(doc, 0) + n
            last = max(last, ts)
        return {"events": out, "lastActivity": last}

    def get_boost(self, user_id, doc_id) -> int:
        """Raw event count for (user, doc); 0 when absent
        (getBoost:142-159)."""
        p = self.get_profile(user_id)
        if not p:
            return 0
        return int(p["events"].get(int(doc_id), 0))

    def boosts_for(self, user_id) -> DataFrame:
        """DataFrame[doc_id, clicks] for :func:`personalize` — one user's
        profile (bucket-pruned read, broadcast-sized by construction)."""
        import os
        d = os.path.join(self.path, f"ubucket={self._bucket(user_id)}")
        if not os.path.isdir(d) or not os.listdir(d):
            return self.spark.createDataFrame([], "doc_id long, clicks long")
        return (self.spark.read.parquet(d)
                .where(F.col("user_id") == str(user_id))
                .groupBy("doc_id")
                .agg(F.sum("n").cast("long").alias("clicks")))

    def compact(self) -> None:
        """Fold event deltas into one row per (user, doc, type) per bucket
        — a per-bucket Spark job, run when delta-file counts grow (the
        LSM pattern again; profiles stay readable throughout).

        Safe against concurrent :meth:`add_event`: the input set is a
        SNAPSHOT of the bucket's delta files taken up front; only exactly
        those files are read and deleted, so an event file landing while
        the fold runs is never touched. The live bucket dir is never
        swapped — the folded file moves IN, then the snapshot inputs are
        removed — so a crash can no longer drop a bucket; the worst case
        is the folded window double-counted until operator cleanup
        (at-least-once accounting — clicks are advisory boosts, the
        reference's in-memory engine offers no durability at all)."""
        import os
        import shutil
        import uuid
        for name in sorted(os.listdir(self.path)):
            if not name.startswith("ubucket="):
                continue
            d = os.path.join(self.path, name)
            if name.endswith(".compact"):  # crash debris from an old fold:
                shutil.rmtree(d, ignore_errors=True)  # inputs still live
                continue
            snapshot = sorted(
                os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet"))
            if len(snapshot) <= 1:
                continue
            folded = (self.spark.read.parquet(*snapshot)
                      .groupBy("user_id", "doc_id", "event_type")
                      .agg(F.sum("n").alias("n"), F.max("ts").alias("ts")))
            tmp = d + ".compact"
            folded.coalesce(1).write.mode("overwrite").parquet(tmp)
            for f in sorted(os.listdir(tmp)):
                if f.endswith(".parquet"):
                    shutil.move(os.path.join(tmp, f),
                                os.path.join(d, f"fold-{uuid.uuid4().hex}.parquet"))
            shutil.rmtree(tmp, ignore_errors=True)
            for f in snapshot:
                os.remove(f)
