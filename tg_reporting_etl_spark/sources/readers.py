"""Table readers.

The reference pulls every input with ``pd.read_sql`` against MariaDB
(task-executor/trans_summary/trans_summary_5min.py:92-93, wrapped in
retry_call tries=10).  Here a scan is a declarative ``spark.read`` —
Catalyst pushes predicates and prunes columns down to the parquet
footers, and fault tolerance comes from Spark task retries instead of
client-side retry loops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Driver-generated deterministic testdata (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Timestamp columns per testdata table.  The driver parquet stores them as
# TIMESTAMP(NANOS), which Spark cannot read natively; with
# spark.sql.legacy.parquet.nanosAsLong=true they surface as nanosecond
# longs and are converted back to TimestampType here (the generator emits
# microsecond-precision values, so ``ns div 1000`` is lossless).
_TS_COLS = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}


def fs_path_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence probe for a sink/index/journal path.

    Cheaper and quieter than read-and-catch-AnalysisException (which
    costs an analyzer pass and prints a FileNotFound stack trace to
    stderr on every bootstrap); resolves any Hadoop-supported scheme
    (local, HDFS, s3a) exactly as a read of the same path would."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return bool(hpath.getFileSystem(spark._jsc.hadoopConfiguration()).exists(hpath))


def read_parquet_if_committed(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame | None:
    """Read a parquet sink if it exists AND holds committed files, else
    ``None`` — the safe probe for self-healing replay paths.

    ``fs_path_exists`` alone is not enough: a crashed prior writer can
    leave the directory existing but file-less (e.g. only a
    ``_temporary`` subdir), in which case an unguarded
    ``spark.read.parquet`` throws at schema inference and every
    subsequent run fails.  Such a torn sink must take the bootstrap
    branch, exactly like an absent one.  Schema resolution is forced
    eagerly so the failure surfaces here, not at the first action.

    ``schema`` (a DDL string): control tables with a FIXED schema
    (rerun journal, digest index) pass it to skip footer inference —
    Spark launches a whole 1-task job per inference, a fixed cost worth
    one job per read on metadata-sized lifecycle tables.  With the
    schema given, a file-less-but-existing dir reads as EMPTY (0 rows)
    rather than bootstrapping — equivalent for these tables (an empty
    journal/index behaves exactly like an absent one)."""
    if not fs_path_exists(spark, path):
        return None
    try:
        reader = spark.read.schema(schema) if schema else spark.read
        df = reader.parquet(path)
        df.schema  # force resolution: an inferred file-less dir fails HERE
        return df
    except Exception as exc:  # noqa: BLE001 — classified below
        # Only the KNOWN torn/absent-sink signatures may take the
        # bootstrap branch: callers treat None as "no committed data"
        # and may OVERWRITE the sink (submit_rerun_requests replaces the
        # whole journal).  A transient failure (FS listing error,
        # permission blip) must RAISE — swallowing it here would let a
        # replay path destroy a perfectly committed table.
        if _is_torn_sink_error(exc):
            return None
        raise


_TORN_ERROR_CLASSES = ("UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND")


def _is_torn_sink_error(exc: Exception) -> bool:
    """True iff ``exc`` is a KNOWN torn/absent-sink signature.

    Primary check is STRUCTURED — exception type plus Spark's stable
    error class (``getCondition()``, falling back to the deprecated
    ``getErrorClass()`` on older lines) — because message substrings
    are brittle across Spark versions and locales: a reworded message
    would turn a legitimate bootstrap into a hard failure of the
    replay path (fail-safe direction, but an availability regression
    on upgrade).  The substring check remains only as a fallback for
    builds whose exceptions carry no error class.
    """
    try:
        from pyspark.errors import AnalysisException
    except ImportError:  # pragma: no cover — ancient pyspark
        AnalysisException = ()  # type: ignore[assignment]
    if isinstance(exc, AnalysisException):
        for probe in ("getCondition", "getErrorClass"):
            try:
                cond = getattr(exc, probe)()
            except Exception:
                continue
            if cond is not None:
                # error classes may be dotted sub-conditions, e.g.
                # "UNABLE_TO_INFER_SCHEMA" itself is the root
                return cond.split(".")[0] in _TORN_ERROR_CLASSES
    msg = str(exc)
    return (
        "UNABLE_TO_INFER_SCHEMA" in msg
        or "Unable to infer schema" in msg
        or "PATH_NOT_FOUND" in msg
        or "Path does not exist" in msg
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table as a DataFrame (columnar, pushdown-capable)."""
    # Runtime-settable; needed even when the caller's session (e.g. the
    # driver's) was not built by session.get_spark.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Micros-flavored testdata (tz-naive) must surface as TIMESTAMP (LTZ,
    # session tz pinned), not TIMESTAMP_NTZ: wall-clock identical, and the
    # streaming watermark path requires LTZ event time.  The session tz
    # pin is what makes "wall-clock identical" true for vanilla caller
    # sessions too — on a non-UTC host, date/hour/minute derivations
    # from LTZ values would otherwise shift relative to NTZ behavior.
    # The pin follows the CONFIGURED zone (session.session_tz — default
    # UTC, overridable via SPARK_GRAFT_SESSION_TZ like the reference's
    # utc_timezone_switch), so a deployment reporting in a local market
    # day gets consistent derivations here and in the oracles, which set
    # DuckDB to the same zone.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    from tg_reporting_etl_spark.session import session_tz

    spark.conf.set("spark.sql.session.timeZone", session_tz())
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC scan — production equivalent of the reference's MariaDB reads.

    Parallelizes the scan by ``partition_column`` ranges so a 1000-executor
    cluster does not funnel the whole table through one connection (the
    reference reads serially through a single client connection).
    Untested here (no DB in the container) but kept as the production
    entry point for source parity.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-Lines corpus reader — the interchange format most raw LLM
    corpora arrive in (one document object per line).

    Scale rules encoded here:
    - ALWAYS pass an explicit ``schema`` in production: without one,
      Spark runs a full inference pre-pass over every byte before the
      real scan (double read at 100 TB).  ``schema=None`` is accepted
      for exploration and costs exactly that extra pass.
    - PERMISSIVE mode with a named corrupt-record column: a single
      malformed line (truncated shard, encoding glitch — guaranteed at
      corpus scale) must neither kill the job (FAILFAST) nor silently
      vanish (DROPMALFORMED).  Callers audit/split on
      ``{corrupt_col} IS NOT NULL`` and route bad lines to quarantine.
      Caveat: Spark rejects queries whose referenced columns are ONLY
      the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — always
      project a data column alongside it (or cache first).
    - JSONL is line-splittable, so a 100 TB directory parallelizes by
      byte ranges like CSV; gzip members are NOT splittable — prefer
      zstd/uncompressed shards upstream.
    """
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if schema is not None:
        # The corrupt column must exist in the schema to be populated.
        # Compare parsed FIELD NAMES, not a substring of the DDL text: a
        # user schema containing the name as a substring (e.g. a column
        # `old_corrupt_record_bak`) must not silently disable
        # malformed-line capture.
        from pyspark.sql.types import StructType

        names = {f.name for f in StructType.fromDDL(schema).fields}
        full = schema if corrupt_col in names else f"{schema}, {corrupt_col} string"
        reader = reader.schema(full)
    return reader.json(path)
