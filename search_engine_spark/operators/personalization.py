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
