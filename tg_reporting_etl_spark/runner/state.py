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

from tg_reporting_etl_spark.operators.risk_ctrl_rtp import (
    rtp_batch,
    rtp_batch_days,
    rtp_merge,
    rtp_merge_days,
)


def _existing_state_days(spark: SparkSession, state_dir: str, date_keys: list[int]) -> list[int]:
    """Which of ``date_keys`` already have a snapshot partition dir.

    Directory existence (not row presence) is the reference's
    "state exists" predicate — an empty snapshot still counts as state,
    so its day takes the merge branch, not first-run init.  Pure
    filesystem metadata calls, O(len(date_keys)).
    """
    from tg_reporting_etl_spark.sources.writers import _fs_path

    try:
        fs, jroot = _fs_path(spark, state_dir)
        if not fs.exists(jroot):
            return []
        return [
            dk
            for dk in date_keys
            if fs.exists(jroot.suffix(f"/summary_date={dk}"))
        ]
    except Exception:
        return []


def load_state(spark: SparkSession, state_dir: str, date_key: int) -> DataFrame | None:
    """One day's snapshot, or None when the day has never been written."""
    path = os.path.join(state_dir, f"summary_date={date_key}")
    try:
        df = spark.read.parquet(path)
        df.schema  # force resolution
    except Exception:
        return None
    if "summary_date" not in df.columns:
        # partitioned layout keeps the key in the dir name, not the files
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
    date_keys = [int(d) for d in date_keys]
    state_days = _existing_state_days(spark, state_dir, date_keys)
    batch = rtp_batch_days(player_1h, date_keys)
    old = None
    if state_days:
        # one scan of the partitioned table, pruned to the stateful days
        old = spark.read.parquet(state_dir).filter(
            F.col("summary_date").isin(state_days)
        ).select(*_final_columns())
    new_state = rtp_merge_days(old, batch, now, state_days=state_days)
    save_state_days(new_state, state_dir)
    return spark.read.parquet(state_dir).filter(
        F.col("summary_date").isin(date_keys)
    ).select(*_final_columns())


def save_state_days(state: DataFrame, state_dir: str) -> None:
    """Persist a multi-day state frame (full snapshot per touched day)."""
    from tg_reporting_etl_spark.operators.risk_ctrl_rtp import KEYS
    from tg_reporting_etl_spark.sources.writers import merge_into

    merge_into(
        state.sparkSession,
        state_dir,
        state,
        keys=["summary_date", *KEYS],
        partition_cols=["summary_date"],
    )


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
