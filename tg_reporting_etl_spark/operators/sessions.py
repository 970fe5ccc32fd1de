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


def with_session_ids(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-EVENT session assignment: each row gains a ``session_id``
    (per-user counter; new session when the gap from the previous event
    exceeds ``gap_minutes``).  The shared first stage of sessionize and
    the funnel operator — one (user_id, ts) shuffle."""
    by_user = W.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(by_user))
    with_breaks = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    return with_breaks.withColumn(
        "session_id",
        F.sum("_new_session").over(by_user.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    ).drop("_new_session")


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session ids per user (new session when the gap from the
    previous event exceeds ``gap_minutes``) and aggregate per session."""
    with_ids = with_session_ids(events, gap_minutes)
    return with_ids.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.countDistinct("event_type").cast("long").alias("n_event_types"),
    )


def funnel_steps(
    events: DataFrame, steps: list[str], gap_minutes: int = 30
) -> DataFrame:
    """Session funnel: how far each session progressed through the
    ordered ``steps`` (an event advances the funnel only when it is the
    NEXT expected step — out-of-order steps don't count), then the
    distribution (funnel_step, n_sessions).

    The per-session progression is a left fold over the time-ordered
    event array — a pure column expression (``array_sort`` +
    ``aggregate``), no UDF and no second shuffle beyond the session
    grouping: genuinely stateful-in-order logic expressed inside
    whole-stage codegen.  Ties on ts break by event_type so the fold
    order is deterministic across engines.
    """
    with_ids = with_session_ids(events, gap_minutes)
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_type")))
    )

    def _advance(acc, e):
        out = acc
        for i, s in enumerate(steps):
            out = F.when((acc == i) & (e.event_type == s), i + 1).otherwise(out)
        return out

    per_session = (
        with_ids.groupBy("user_id", "session_id")
        .agg(F.aggregate(ordered, F.lit(0), _advance).alias("funnel_step"))
    )
    return per_session.groupBy("funnel_step").agg(
        F.count("*").cast("long").alias("n_sessions")
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Daily retention triangle: users grouped by first-seen day
    (cohort), counted on each later active day as an offset from their
    cohort day — (cohort_date, day_offset, n_users).

    Two aggregations on the SAME key (user_id): the first-seen min and
    the distinct active days both shuffle on user_id, so Catalyst
    reuses one exchange for the join; the final (cohort, offset) agg is
    over a frame bounded by users x active-days.  day_offset 0 row ==
    cohort size, so retention rate is a ratio within the result.
    """
    day = F.to_date("ts")
    first = events.groupBy("user_id").agg(F.min(day).alias("cohort_date"))
    active = events.select("user_id", day.alias("active_date")).distinct()
    return (
        active.join(first, "user_id")
        .select(
            "cohort_date",
            F.datediff("active_date", "cohort_date").cast("int").alias("day_offset"),
        )
        .groupBy("cohort_date", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def trailing_active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Exact trailing-N-day active users per day (WAU shape):
    (report_date, n_active) where a user counts if active on any of the
    N days ending at report_date.

    Spark-first shape: the (user, day) distinct frame fans each active
    day out to the ``window_days`` report days it contributes to (a
    bounded explode — no day-range self-join), then one distinct count
    per report day.  Report days with no activity in range simply don't
    appear.  The sketch path for 100 TB — per-day HLL sketches merged
    per window via hll_sketch_agg/hll_union_agg — is pytest-covered
    next to this (error-bounded), trading exactness for mergeable
    per-day state.
    """
    day = F.to_date("ts")
    per_day = events.select("user_id", day.alias("active_date")).distinct()
    fanned = per_day.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("active_date"),
                F.date_add("active_date", window_days - 1),
            )
        ).alias("report_date"),
    )
    return fanned.groupBy("report_date").agg(
        F.count_distinct("user_id").cast("long").alias("n_active")
    )
