"""Manual-rerun request journal.

The reference keeps manual rerun requests in the
``rerun_board_manually_insert`` table: operators INSERT rows with
``done=0``; the producer expands each pending row into tasks and then
UPDATEs it with ``apply_time`` + ``done=1`` so the next scan skips it
(GetRelatedTimeSplit.py:87-96).  Spark-first equivalent: the journal is
a parquet table, consumption is one job — scan pending, expand via
:func:`rerun_cascade`, mark applied with the MERGE-shaped upsert.
Replaying the scan is then a no-op (the "done = replay is empty" test
in tests/test_rerun_journal.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tg_reporting_etl_spark.runner.board import rerun_cascade
from tg_reporting_etl_spark.sources.readers import read_parquet_if_committed
from tg_reporting_etl_spark.sources.writers import overwrite_small_table

#: Identity of one request row — the full WHERE clause of the
#: reference's UPDATE (platform/site/game/report_class/bounds/flags).
REQUEST_KEYS = [
    "platform",
    "site_code",
    "game_code",
    "report_class",
    "gte_time",
    "lt_time",
    "5min",
    "1h",
    "1d",
    "1m",
]

#: The journal's FIXED on-disk schema: passing it to reads skips
#: parquet footer inference — a whole 1-task Spark job per read,
#: meaningful on a metadata-sized table read once per lifecycle step.
JOURNAL_SCHEMA = (
    "platform string, site_code string, game_code string, report_class string, "
    "gte_time timestamp, lt_time timestamp, `5min` int, `1h` int, `1d` int, `1m` int, "
    "done int, apply_time timestamp"
)


def submit_rerun_requests(spark: SparkSession, journal_path: str, requests: DataFrame) -> None:
    """Append operator-submitted requests to the journal (``done=0``).

    Resubmitting a request identical to one still PENDING is a no-op
    (it would double-expand the same window).  Resubmitting a request
    that was already APPLIED re-activates it — the merge replaces the
    ``done=1`` row with a fresh ``done=0`` one, so the next consume
    picks it up again.  This matches the reference, where operators may
    INSERT the same row a second time and have it consumed again
    (task-producer/rerun_producer/ScanRerunManually.py:19-25).
    """
    batch = requests.withColumn("done", F.lit(0)).withColumn(
        "apply_time", F.lit(None).cast("timestamp")
    )
    # Committed-read probe (not bare existence): a crash can leave the
    # journal dir existing but file-less, which must bootstrap, not
    # throw.  The bootstrap itself goes through the swap-write path so
    # the journal directory is only ever absent or complete — a direct
    # overwrite here could itself leave a torn dir mid-write.
    existing = read_parquet_if_committed(spark, journal_path, JOURNAL_SCHEMA)
    if existing is None:
        overwrite_small_table(spark, journal_path, batch)
        return
    # Merge semantics via ONE window over the union — no joins at all:
    # a still-PENDING journal row and its resubmission are bit-identical
    # (done=0, apply_time NULL), so "duplicate of pending is a no-op"
    # and "resubmit of applied re-activates" both reduce to keeping,
    # per request key, the row with the smallest ``done`` (0 = pending
    # beats 1 = applied; ties are identical rows).  One metadata-sized
    # shuffle + swap-write replaces round 8's two anti-join stages —
    # the journal is one row per operator request by contract, so the
    # window partition count is trivially bounded.
    merged = existing.select(*batch.columns).unionByName(batch)
    w = Window.partitionBy(*REQUEST_KEYS).orderBy(F.col("done").asc())
    keep = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    overwrite_small_table(spark, journal_path, keep, presized=True)


def consume_rerun_requests(spark: SparkSession, journal_path: str, now: str) -> DataFrame:
    """Expand every pending request into tasks and journal it applied.

    Returns the expanded task rows (materialized — the journal update
    happens before the caller sees them, matching the reference's
    update-inside-the-loop).  A second call with no new submissions
    returns an empty frame.
    """
    journal = read_parquet_if_committed(spark, journal_path, JOURNAL_SCHEMA)
    if journal is None:  # absent OR torn mid-bootstrap: both mean empty
        return _empty_tasks(spark)
    snap = journal.toPandas()
    # The journal is metadata-sized BY CONTRACT (one row per operator
    # request — the same class of bounded orchestration metadata as the
    # board rows the executor collects), so consume snapshots it to the
    # driver in ONE job and roots everything else on that LocalRelation:
    # the pending-emptiness probe is a driver-side check (no extra job),
    # the returned cascade needs NO eager checkpoint (its lineage no
    # longer touches the files the overwrite below replaces), and the
    # applied rewrite is a second, final job.  Two jobs total, down from
    # four (probe + checkpoint + rewrite + ...) in the join-era shape.
    if snap[snap["done"] == 0].empty:
        return _empty_tasks(spark)
    pending = spark.createDataFrame(
        snap.loc[snap["done"] == 0, [k for k in REQUEST_KEYS]],
        journal.select(*REQUEST_KEYS).schema,
    )
    tasks = rerun_cascade(pending)
    # consume applies EVERY pending row, so the post-consume journal is
    # a one-pass column rewrite of the snapshot (done 0 -> 1, stamp
    # apply_time), swap-written once — no keyed merge needed.
    applied = snap.copy()
    applied.loc[applied["done"] == 0, "apply_time"] = pd.Timestamp(now)
    applied["done"] = 1
    overwrite_small_table(
        spark,
        journal_path,
        spark.createDataFrame(applied, journal.schema),
        presized=True,
    )
    return tasks


def _empty_tasks(spark: SparkSession) -> DataFrame:
    probe = spark.createDataFrame(
        [],
        "platform string, site_code string, game_code string, report_class string, "
        "gte_time timestamp, lt_time timestamp, `5min` int, `1h` int, `1d` int, `1m` int",
    )
    return rerun_cascade(probe)
