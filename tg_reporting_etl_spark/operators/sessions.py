"""Sessionization over the events stream table.

Not in the reference (its windows are fixed 5-min slices); included as
the canonical event-time operator a training-data pipeline needs:
gap-based sessions via lag + running sum of session-break flags — two
window functions over one (user_id, ts) shuffle, no UDFs.  In streaming
form this is ``session_window(ts, gap)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session ids per user (new session when the gap from the
    previous event exceeds ``gap_minutes``) and aggregate per session."""
    by_user = W.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(by_user))
    with_breaks = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    with_ids = with_breaks.withColumn(
        "session_id",
        F.sum("_new_session").over(by_user.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    return with_ids.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.countDistinct("event_type").cast("long").alias("n_event_types"),
    )
