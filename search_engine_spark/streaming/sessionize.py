"""Custom stateful streaming operator: event sessionization.

The batch sessionizer (window lag over user_id) needs the whole history;
the streaming version keeps per-user GroupState via
``applyInPandasWithState`` — the Spark-native way to express a custom
stateful operator the built-in windowed aggregates can't: sessions close on
a GAP (30 min of user inactivity), not on fixed window boundaries.

State per user = (session_start_us, last_seen_us, n_events). A micro-batch
folds its (sorted) events into the open session, EMITS every session it
closes (gap exceeded within the batch), and parks the still-open session
back into state; a processing-time timeout flushes open sessions for users
that went quiet. At 100 TB/day event rates state is O(active users) — the
state store shards by user_id hash across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import (GroupState,
                                         GroupStateTimeout)

SESSION_GAP_US = 30 * 60 * 1_000_000

OUT_SCHEMA = ("user_id long, session_start timestamp, "
              "session_end timestamp, n_events long")
STATE_SCHEMA = "start_us long, last_us long, n long"


def _sessionize_group(key, pdf_iter: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame({"user_id": [user_id],
                            "session_start": [pd.Timestamp(start_us, unit="us")],
                            "session_end": [pd.Timestamp(last_us, unit="us")],
                            "n_events": [n]})
        return
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = None
        n = 0
    closed = []
    for pdf in pdf_iter:
        us = pdf["us"].sort_values()
        for t in us:
            t = int(t)
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > SESSION_GAP_US:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
    if start_us is not None:
        state.update((start_us, last_us, n))
        state.setTimeoutDuration(60 * 1000)  # flush quiet users in 60 s
    if closed:
        yield pd.DataFrame({
            "user_id": [user_id] * len(closed),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
            "n_events": [c for _, _, c in closed],
        })


def sessionize_stream(events: DataFrame, ts_col: str = "ts",
                      user_col: str = "user_id") -> DataFrame:
    """events stream → closed sessions (user_id, start, end, n_events)."""
    src = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"))
    return (src.groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_group, OUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.ProcessingTimeTimeout))
