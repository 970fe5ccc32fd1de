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
NO ``df.rdd`` conversion, which would force a Python-side RDD wrapper
of the analyzed plan on the hot path.  Estimates are memoized per
(application, file set, split confs): repeated query constructions
over the same table (four dedup entry points share char_shingles; a
streaming sink constructs per micro-batch) pay the driver-side file
stats once, not per call — on an object store each getFileStatus is a
network round trip.

NON-FILE frames (createDataFrame fixtures, foreachBatch micro-batches
from memory/Kafka sources: ``inputFiles() == []``) fall back to the
JVM-side physical partition count (``queryExecution().toRdd().
getNumPartitions()`` — builds no Python RDD wrapper).  Plans that
contain an Exchange are short-circuited to "unknown" first: under AQE,
``toRdd()`` materializes the shuffle stages of such plans eagerly, and
an estimate must never pay hidden execution.  A single-partition Kafka
topic or parallelized fixture is exactly as serializing as a
single-split file scan, and the pre-round-11 gate fanned those out
too.

``fan_out`` repartitions only when the estimated split count is below
the session's default parallelism.  The two regimes:

- small/compact input (the local + probe case): few splits, so the
  repartition shuffles little data and buys full-width CPU for the
  amplifying operator downstream;
- cluster-scale input: splits >= cores, estimate says so, no-op —
  never an added shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: stat at most this many files — a scan with more files than this has
#: at least that many splits, which exceeds any local parallelism we
#: gate on (cap keeps the driver-side stat loop O(cores), not O(files))
_STAT_CAP = 256

#: (app_id, files tuple, maxPartitionBytes, openCostInBytes) -> estimate
_ESTIMATE_CACHE: dict[tuple, int] = {}


def _bytes_conf(spark, key: str, default: int) -> int:
    try:
        raw = spark.conf.get(key)
        return int(spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
    except Exception:
        return default


def _physical_partitions(df: DataFrame) -> int | None:
    """JVM-side partition count of the planned query — no Python RDD
    wrapper.  With AQE enabled, ``toRdd()`` on a plan that CONTAINS
    exchanges materializes the shuffle stages eagerly (runs real jobs)
    at estimate time, so any plan with an Exchange short-circuits to
    ``None`` — the gate must never trigger hidden execution just to
    decide whether to repartition.  Exchange-free plans (the intended
    callers: createDataFrame fixtures, memory-source micro-batches)
    plan without running jobs.  None if internals shift."""
    try:
        qe = df._jdf.queryExecution()
        # executedPlan (NOT sparkPlan, which is pre-EnsureRequirements
        # and shows no exchanges) is prepared lazily — building its
        # string runs no jobs; only toRdd() on an exchange-bearing AQE
        # plan would.
        if "Exchange" in qe.executedPlan().toString():
            return None
        return int(qe.toRdd().getNumPartitions())
    except Exception:
        return None


def scan_split_estimate(df: DataFrame) -> int | None:
    """Estimated number of scan splits for ``df``: file-stat arithmetic
    for file sources, JVM physical partition count otherwise.  ``None``
    only when neither path can answer.  Never touches ``df.rdd``."""
    spark = df.sparkSession
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        return _physical_partitions(df)
    max_pb = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    par = spark.sparkContext.defaultParallelism
    if len(files) > _STAT_CAP:
        # Skip the O(files) stat loop, NOT the packing arithmetic: Spark
        # bin-packs small files into shared partitions, so ">= one split
        # per file" is false — a scan of many tiny files can plan far
        # fewer partitions than files.  Lower-bound the packed count
        # from openCostInBytes alone (each file contributes >= open_cost
        # to the packing total); under-estimating is the safe direction
        # (at worst a cheap repartition of tiny files, never a skipped
        # widening).
        n = len(files)
        total_lb = n * max(open_cost, 1)
        max_split = min(max_pb, max(open_cost, total_lb // max(par, 1)))
        return max(1, -(-total_lb // max(max_split, 1)))
    ck = (spark.sparkContext.applicationId, tuple(sorted(files)), max_pb, open_cost)
    if ck in _ESTIMATE_CACHE:
        return _ESTIMATE_CACHE[ck]
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
    est = max(1, int(total // max(max_split, 1)) + (1 if total % max(max_split, 1) else 0))
    if len(_ESTIMATE_CACHE) > 1024:  # bound the memo for long-lived drivers
        _ESTIMATE_CACHE.clear()
    _ESTIMATE_CACHE[ck] = est
    return est


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
