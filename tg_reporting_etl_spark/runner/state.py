"""Snapshot-state persistence for the stateful rtp report.

The reference keeps risk_ctrl_rtp_1d state in a DB table it reads back
each run (risk_ctrl_rtp_1d.py:122-135).  The plain-parquet engine keeps
ONE state table partitioned by summary_date (``summary_date=N``
partition dirs) and upserts it through the MERGE-shaped sink — with
Delta available this becomes MERGE INTO; the state transition itself
stays the pure function in operators/risk_ctrl_rtp.py.

Backfill shape: day snapshots are independent (a day's state depends
only on that day's batch and its own prior snapshot), so
:func:`run_rtp_days` merges a whole contiguous day range as ONE
aggregate + ONE merge + ONE partitioned write — a month-long backfill
issues O(1) Spark jobs instead of ~30 sequential per-day merges.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tg_reporting_etl_spark.operators.risk_ctrl_rtp import (
    rtp_batch,
    rtp_batch_days,
    rtp_merge,
    rtp_merge_days,
)


def _existing_state_days(spark: SparkSession, state_dir: str, date_keys: list[int]) -> list[int]:
    """Which of ``date_keys`` already have a snapshot partition dir.

    Directory existence (not row presence) is the reference's
    "state exists" predicate — an empty snapshot still counts as state
    (:func:`save_state_days` writes a marker dir for touched-but-empty
    days), so its day takes the merge branch, not first-run init.  Pure
    filesystem metadata calls, O(len(date_keys)).

    Filesystem errors PROPAGATE: returning [] on a transient FS fault
    would reclassify every day as first-run, and the subsequent merge
    would overwrite real snapshots with zeroed alert state — failing
    the run is strictly safer than silently resetting alert throttles.
    Only a genuinely absent root directory means "no state yet".
    """
    from tg_reporting_etl_spark.sources.writers import _fs_path

    fs, jroot = _fs_path(spark, state_dir)
    if not fs.exists(jroot):
        return []
    return [
        dk
        for dk in date_keys
        if fs.exists(jroot.suffix(f"/summary_date={dk}"))
    ]


def load_state(spark: SparkSession, state_dir: str, date_key: int) -> DataFrame | None:
    """One day's snapshot, or None when the day has never been written.

    A touched-but-empty day (bare marker partition dir) returns an
    EMPTY frame, not None — directory existence is the state predicate.
    The explicit schema makes the empty read well-defined (no files to
    infer from) and skips footer sampling.
    """
    from tg_reporting_etl_spark.operators.risk_ctrl_rtp import FINAL_SCHEMA
    from tg_reporting_etl_spark.sources.writers import _fs_path

    path = os.path.join(state_dir, f"summary_date={date_key}")
    fs, jpath = _fs_path(spark, path)
    if not fs.exists(jpath):
        return None
    # partitioned layout keeps the key in the dir name, not the files
    data_schema = T.StructType([f for f in FINAL_SCHEMA.fields if f.name != "summary_date"])
    df = spark.read.schema(data_schema).parquet(path)
    df = df.withColumn("summary_date", F.lit(int(date_key)).cast("int"))
    return df.select(*_final_columns())


def _final_columns() -> list[str]:
    from tg_reporting_etl_spark.operators.risk_ctrl_rtp import FINAL_COLUMNS

    return FINAL_COLUMNS


def save_state(state: DataFrame, state_dir: str, date_key: int) -> None:
    """Persist a day snapshot into the partitioned state table.

    ``merge_into`` with the report's grain keys: matched rows are
    replaced by the new state, unmatched kept, new keys inserted — the
    new-state plan *reads* the current snapshot, which the sink's eager
    checkpoint covers.  (rtp_merge already emits the full merged
    snapshot, so replace-all is the degenerate merge; the keyed API is
    what a MERGE-capable table format maps onto directly.)"""
    save_state_days(state, state_dir)


def run_rtp_days(
    spark: SparkSession,
    player_1h: DataFrame,
    date_keys: list[int],
    now: dt.datetime,
    state_dir: str,
) -> DataFrame:
    """One scheduled run over a contiguous day range:
    load snapshots -> merge batch -> persist, all as single jobs.

    Re-running with the same inputs+clock is idempotent at the storage
    level (per-day snapshot overwrite == the reference's
    delete-before-insert on summary_date).
    """
    from tg_reporting_etl_spark.operators.risk_ctrl_rtp import FINAL_SCHEMA

    date_keys = [int(d) for d in date_keys]
    state_days = _existing_state_days(spark, state_dir, date_keys)
    batch = rtp_batch_days(player_1h, date_keys)
    old = None
    if state_days:
        # one scan of the partitioned table, pruned to the stateful days
        # (explicit schema: marker-only dirs have no files to infer from)
        old = spark.read.schema(FINAL_SCHEMA).parquet(state_dir).filter(
            F.col("summary_date").isin(state_days)
        ).select(*_final_columns())
    new_state = rtp_merge_days(old, batch, now, state_days=state_days)
    save_state_days(new_state, state_dir, touched_days=date_keys)
    return spark.read.schema(FINAL_SCHEMA).parquet(state_dir).filter(
        F.col("summary_date").isin(date_keys)
    ).select(*_final_columns())


def save_state_days(
    state: DataFrame, state_dir: str, touched_days: list[int] | None = None
) -> None:
    """Persist a multi-day state frame (full snapshot per touched day).

    ``touched_days``: every day this run PROCESSED, including days whose
    merged state came out empty.  Dynamic partition overwrite writes no
    ``summary_date=N`` dir for an empty day, which would make the day
    look never-run and route its next batch through first-run init
    (throttle/cap skipped).  An empty marker partition dir is created
    for each touched day with no rows, so the reference's "directory
    existence == state exists" predicate holds even for empty snapshots
    (Spark's partition discovery ignores empty leaf dirs on read).
    """
    from tg_reporting_etl_spark.operators.risk_ctrl_rtp import KEYS
    from tg_reporting_etl_spark.sources.writers import _fs_path, merge_into

    spark = state.sparkSession
    merge_into(
        spark,
        state_dir,
        state,
        keys=["summary_date", *KEYS],
        partition_cols=["summary_date"],
    )
    if touched_days:
        fs, jroot = _fs_path(spark, state_dir)
        for dk in touched_days:
            jday = jroot.suffix(f"/summary_date={int(dk)}")
            if not fs.exists(jday):
                fs.mkdirs(jday)


def run_rtp_day(
    spark: SparkSession,
    player_1h: DataFrame,
    date_key: int,
    now: dt.datetime,
    state_dir: str,
) -> DataFrame:
    """Single-day :func:`run_rtp_days` (kept as the unit-granular API —
    the alert-state chain within one day is inherently sequential)."""
    return run_rtp_days(spark, player_1h, [int(date_key)], now, state_dir)


__all__ = [
    "load_state",
    "save_state",
    "save_state_days",
    "run_rtp_day",
    "run_rtp_days",
    "rtp_batch",
    "rtp_merge",
    "rtp_batch_days",
    "rtp_merge_days",
]
