"""Scan-split-aware fan-out for explode/CPU-amplifying operators.

A compact parquet file hides work from the scheduler: snappy text
compresses ~50x, a single file yields a single scan split, and an
operator that amplifies each input row (char-gram explode, shingling,
md5 per window) then runs single-threaded until its first shuffle.  At
cluster scale the scan has thousands of splits and NO extra exchange
should ever be added — so the decision must come from what the SCAN
will do, not from a blanket ``repartition``.

``scan_split_estimate`` reproduces Spark's own file-split arithmetic
(`FilePartition.maxSplitBytes`: maxSplitBytes = min(maxPartitionBytes,
max(openCostInBytes, totalBytes / leaf parallelism)); files are split
to that size and bin-packed) from ``df.inputFiles()`` + file sizes —
NO ``df.rdd`` conversion, which would force a Python->RDD round trip
of the analyzed plan on the hot path.

``fan_out`` repartitions only when the estimated split count is below
the session's default parallelism.  The two regimes:

- small/compact input (the local + probe case): few splits, so the
  repartition shuffles little data and buys full-width CPU for the
  amplifying operator downstream;
- cluster-scale input: splits >= cores, estimate says so, no-op —
  never an added shuffle at 100 TB.

In-memory frames (createDataFrame/LocalRelation: ``inputFiles() ==
[]``) are left untouched — their slicing already reflects the caller's
choice and test fixtures are tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: stat at most this many files — a scan with more files than this has
#: at least that many splits, which exceeds any local parallelism we
#: gate on (cap keeps the driver-side stat loop O(cores), not O(files))
_STAT_CAP = 256


def _bytes_conf(spark, key: str, default: int) -> int:
    try:
        raw = spark.conf.get(key)
        return int(spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
    except Exception:
        return default


def scan_split_estimate(df: DataFrame) -> int | None:
    """Estimated number of scan splits for ``df``'s file sources, from
    file count/sizes and Spark's split formula.  ``None`` for non-file
    sources (nothing to estimate).  Never touches ``df.rdd``."""
    spark = df.sparkSession
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if len(files) > _STAT_CAP:
        return len(files)  # >= one split per file — already wide
    max_pb = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    par = spark.sparkContext.defaultParallelism
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    try:
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen() + open_cost
    except Exception:
        return None
    max_split = min(max_pb, max(open_cost, total // max(par, 1)))
    return max(1, int(total // max(max_split, 1)) + (1 if total % max(max_split, 1) else 0))


def fan_out(df: DataFrame, *cluster_keys: str) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when its
    scan would produce fewer splits — cheap by construction (few splits
    <=> few bytes) and a no-op at cluster scale.  With ``cluster_keys``
    the repartition hashes on those columns, so a downstream groupBy on
    a key subset reuses the clustering instead of adding an exchange."""
    par = df.sparkSession.sparkContext.defaultParallelism
    splits = scan_split_estimate(df)
    if splits is None or splits >= par:
        return df
    return df.repartition(par, *cluster_keys) if cluster_keys else df.repartition(par)
