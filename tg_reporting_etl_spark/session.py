"""SparkSession factory tuned for this engine.

Local mode is the test bed; the config block is written for a real
multi-executor cluster too (AQE, skew-join handling, dynamic partition
overwrite for the idempotent delete-before-insert sinks — reference
semantics at task-executor/trans_summary/trans_summary_5min.py:103-128).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def session_tz() -> str:
    """The configured session timezone (reference: task_config
    ``utc_timezone_switch`` flipping the process TZ,
    task-producer/main.py:26-28).  Default UTC — the tz the testdata
    oracles assume; deployments serving a local-market reporting day set
    ``SPARK_GRAFT_SESSION_TZ`` (e.g. ``Asia/Taipei``) and every
    date-key/hour/minute derivation follows it, exactly as the
    reference's strftime calls follow the flipped process TZ."""
    return os.environ.get("SPARK_GRAFT_SESSION_TZ", "UTC")


def get_spark(
    app_name: str = "tg_reporting_etl_spark",
    cpus: int | None = None,
    tz: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    - Session timezone from ``tz`` / ``SPARK_GRAFT_SESSION_TZ`` (default
      UTC): testdata timestamps are naive and the DuckDB oracle treats
      them as UTC-naive; pinning UTC makes hour()/day() derivations
      agree.  A non-UTC configured zone shifts every derivation
      consistently (see :func:`session_tz`).
    - AQE on: runtime coalescing + skew-join splitting (player grain is
      skewed — whales bet orders of magnitude more than the median).
    - partitionOverwriteMode=dynamic: the Spark-native replacement for the
      reference's DELETE-then-INSERT window idempotency.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default 64m advisory lets AQE coalesce byte-small shuffles
        # (e.g. candidate-pair lists) down to 1-5 partitions even when
        # the next stage is CPU-dense per row (array intersects, GEMM
        # blocks); 8m keeps such stages wide without fragmenting
        # byte-heavy ones.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.session.timeZone", tz or session_tz())
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata parquet stores TIMESTAMP(NANOS) which Spark rejects;
        # read as long and convert in sources.readers.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # testdata timestamps are tz-naive; infer them as TIMESTAMP (LTZ,
        # pinned UTC above) rather than TIMESTAMP_NTZ — wall-clock values
        # are identical under UTC and streaming watermarks require LTZ.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    spark = builder.getOrCreate()
    # getOrCreate may reuse a live session whose builder config is then
    # ignored; session tz is runtime-settable, so apply it directly too.
    spark.conf.set("spark.sql.session.timeZone", tz or session_tz())
    spark.sparkContext.setLogLevel("WARN")
    return spark
