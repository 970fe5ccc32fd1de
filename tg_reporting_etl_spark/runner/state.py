"""Snapshot-state persistence for the stateful rtp report.

The reference keeps risk_ctrl_rtp_1d state in a DB table it reads back
each run (risk_ctrl_rtp_1d.py:122-135).  The plain-parquet engine keeps
one snapshot directory per summary_date and overwrites it atomically per
run — with Delta available this becomes MERGE INTO; the state transition
itself stays the pure function in operators/risk_ctrl_rtp.py.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession

from tg_reporting_etl_spark.operators.risk_ctrl_rtp import rtp_batch, rtp_merge


def load_state(spark: SparkSession, state_dir: str, date_key: int) -> DataFrame | None:
    path = os.path.join(state_dir, f"summary_date={date_key}")
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def save_state(state: DataFrame, state_dir: str, date_key: int) -> None:
    """Persist a day snapshot through the MERGE-shaped sink.

    ``merge_into`` with the report's grain keys: matched rows are
    replaced by the new state, unmatched kept, new keys inserted —
    and its two-phase staging covers the fact that the new state plan
    *reads* the current snapshot.  (rtp_merge already emits the full
    merged snapshot, so replace-all is the degenerate merge; the keyed
    API is what a MERGE-capable table format maps onto directly.)"""
    from tg_reporting_etl_spark.operators.risk_ctrl_rtp import KEYS
    from tg_reporting_etl_spark.sources.writers import merge_into

    path = os.path.join(state_dir, f"summary_date={date_key}")
    merge_into(state.sparkSession, path, state, keys=KEYS)


def run_rtp_day(
    spark: SparkSession,
    player_1h: DataFrame,
    date_key: int,
    now: dt.datetime,
    state_dir: str,
) -> DataFrame:
    """One scheduled run: load snapshot -> merge batch -> persist.

    Re-running with the same inputs+clock is idempotent at the storage
    level (full snapshot overwrite == the reference's
    delete-before-insert on summary_date).
    """
    old = load_state(spark, state_dir, date_key)
    new_state = rtp_merge(old, rtp_batch(player_1h, date_key), now)
    save_state(new_state, state_dir, date_key)
    return spark.read.parquet(os.path.join(state_dir, f"summary_date={date_key}"))
