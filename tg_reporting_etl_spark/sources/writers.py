"""Idempotent sinks.

The reference guarantees window idempotency with DELETE-before-INSERT
keyed on (summary_date[, hours[, mins]]) plus optional platform/site/game
filters (task-executor/trans_summary/trans_summary_5min.py:103-128 and 11
sibling sites — SURVEY.md §2.1 S3).  The Spark-native equivalent is
dynamic partition overwrite on tables partitioned by exactly those delete
keys: rewriting a window replaces only the partitions the new batch
touches, atomically per partition, and re-running a window job is a no-op
change.  At 100 TB this also gives partition pruning on every tier read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_append(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """Plain append — reference ``to_sql(if_exists='append')`` analog
    (trans_summary_5min.py:49)."""
    writer = df.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def overwrite_window_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Delete-before-insert as dynamic partition overwrite.

    Requires ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set in
    session.py): only partitions present in ``df`` are replaced; all other
    windows are untouched.  This is the exactly-once-ish sink semantics of
    SURVEY.md §2.10 ST6.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
