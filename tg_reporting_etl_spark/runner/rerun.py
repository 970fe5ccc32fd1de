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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tg_reporting_etl_spark.runner.board import rerun_cascade
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
    try:
        existing = spark.read.parquet(journal_path)
        existing.schema
    except Exception:
        batch.write.mode("overwrite").parquet(journal_path)
        return
    # drop only duplicates of still-pending requests; applied rows get
    # replaced and become pending again.  The replacement is built as
    # ONE plan (kept rows + fresh rows) and swap-written once — not a
    # separate anti-join pass followed by a generic merge, which would
    # re-read the journal and double the fixed per-job cost of this
    # metadata-sized table.
    pending = existing.filter(F.col("done") == 0)
    fresh = batch.join(pending.select(*REQUEST_KEYS), REQUEST_KEYS, "left_anti")
    kept = existing.join(fresh.select(*REQUEST_KEYS), REQUEST_KEYS, "left_anti")
    overwrite_small_table(
        spark, journal_path, kept.select(*batch.columns).unionByName(fresh)
    )


def consume_rerun_requests(spark: SparkSession, journal_path: str, now: str) -> DataFrame:
    """Expand every pending request into tasks and journal it applied.

    Returns the expanded task rows (materialized — the journal update
    happens before the caller sees them, matching the reference's
    update-inside-the-loop).  A second call with no new submissions
    returns an empty frame.
    """
    try:
        journal = spark.read.parquet(journal_path)
        journal.schema
    except Exception:
        return _empty_tasks(spark)
    pending = journal.filter(F.col("done") == 0).select(*REQUEST_KEYS)
    if pending.limit(1).isEmpty():
        return _empty_tasks(spark)
    tasks = rerun_cascade(pending).localCheckpoint(eager=True)
    # consume applies EVERY pending row, so the post-consume journal is
    # a one-pass column rewrite of the live table (done 0 -> 1, stamp
    # apply_time), swap-written once — no keyed merge needed.
    applied = journal.select(
        *REQUEST_KEYS,
        F.lit(1).alias("done"),
        F.when(F.col("done") == 0, F.lit(now).cast("timestamp"))
        .otherwise(F.col("apply_time"))
        .alias("apply_time"),
    )
    overwrite_small_table(spark, journal_path, applied)
    return tasks


def _empty_tasks(spark: SparkSession) -> DataFrame:
    probe = spark.createDataFrame(
        [],
        "platform string, site_code string, game_code string, report_class string, "
        "gte_time timestamp, lt_time timestamp, `5min` int, `1h` int, `1d` int, `1m` int",
    )
    return rerun_cascade(probe)
