"""functions/fanout.py — scan-split-estimate gated repartition.

The contract: compact file scans fan out to full parallelism before a
CPU-amplifying operator; wide scans and non-file frames are untouched
(never an added exchange at cluster scale); and the estimate never
crosses into the RDD API (the round-10 verdict's hot-path finding).
"""

from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions.fanout import fan_out, scan_split_estimate


def test_compact_scan_estimates_few_splits(spark, tmp_path):
    path = str(tmp_path / "tiny")
    spark.range(1000).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    est = scan_split_estimate(df)
    assert est is not None and est < spark.sparkContext.defaultParallelism


def test_fan_out_widens_compact_scan(spark, tmp_path):
    path = str(tmp_path / "tiny2")
    spark.range(1000).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    out = fan_out(df)
    # the repartition must actually appear in the plan
    assert "Exchange RoundRobinPartitioning" in out._jdf.queryExecution().toString() or (
        "REPARTITION" in out._jdf.queryExecution().toString()
    )
    assert out.count() == 1000


def test_fan_out_with_keys_hashes_on_keys(spark, tmp_path):
    path = str(tmp_path / "tiny3")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    out = fan_out(df, "k")
    plan = out._jdf.queryExecution().toString()
    assert "hashpartitioning(k" in plan
    # a downstream groupBy on the key reuses the clustering: exactly one
    # exchange in the executed plan (the fan-out itself)
    agg = out.groupBy("k").agg(F.sum("id").alias("s"))
    agg.collect()
    # AQE's toString carries Final AND Initial plans — count in the final
    final = agg._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1


def test_in_memory_frames_use_physical_partition_fallback(spark):
    """Non-file frames (fixtures, foreachBatch micro-batches) fall back
    to the JVM physical partition count: a 1-slice frame fans out (the
    pre-round-11 behavior — a 1-partition Kafka topic serializes CPU
    work exactly like a 1-split file), a frame already at parallelism
    is untouched."""
    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(100, numPartitions=1).selectExpr("id", "id * 2 AS v")
    est = scan_split_estimate(narrow)
    assert est == 1
    widened = fan_out(narrow)
    assert widened is not narrow
    assert widened.count() == 100

    wide = spark.range(100, numPartitions=par).selectExpr("id")
    assert scan_split_estimate(wide) == par
    assert fan_out(wide) is wide


def test_wide_scan_untouched(spark, tmp_path, monkeypatch):
    """A scan whose estimated splits >= parallelism gets no exchange.
    Simulated by shrinking maxPartitionBytes so the tiny file yields
    many splits."""
    path = str(tmp_path / "wide")
    spark.range(200_000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    ).coalesce(1).write.parquet(path)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        df = spark.read.parquet(path)
        est = scan_split_estimate(df)
        assert est is not None and est >= spark.sparkContext.defaultParallelism
        assert fan_out(df) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)


def test_many_files_estimate_accounts_for_bin_packing(spark, tmp_path, monkeypatch):
    """Above _STAT_CAP the stat loop is skipped, but the packing
    arithmetic must survive: Spark bin-packs small files into shared
    partitions, so '>= one split per file' overstates width.  With n
    tiny files and n > parallelism, maxSplitBytes is driven by the
    totalBytes/parallelism term and the openCost lower bound packs to
    ~parallelism partitions, NOT n."""
    from tg_reporting_etl_spark.functions import fanout

    monkeypatch.setattr(fanout, "_STAT_CAP", 4)
    n = 40
    path = str(tmp_path / "many")
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    try:
        # AQE would re-pack the 40 tiny write partitions into fewer files
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.range(4000).repartition(n).write.parquet(path)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= n
    par = spark.sparkContext.defaultParallelism
    est = scan_split_estimate(df)
    # openCost-only lower bound: total_lb = n*open, max_split =
    # min(max_pb, max(open, total_lb/par)) -> est ≈ par for n > par
    assert est is not None and est < n
    assert est >= par  # and still wide enough that fan_out no-ops
    assert fan_out(df) is df


def test_exchange_bearing_memory_plan_short_circuits(spark):
    """Non-file frames whose plan contains an Exchange return None from
    the estimator (under AQE, toRdd() would materialize those shuffle
    stages eagerly — real jobs at estimate time), and fan_out leaves
    them untouched."""
    df = spark.range(1000, numPartitions=4).groupBy((F.col("id") % 10).alias("k")).count()
    assert not df.inputFiles()
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    assert scan_split_estimate(df) is None
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before, "estimate must not run jobs on exchange plans"
    assert fan_out(df) is df


def test_estimate_never_touches_rdd(spark, tmp_path, monkeypatch):
    """Crossing into df.rdd forces a Python-side conversion of the
    analyzed plan — the exact hot-path cost this module exists to
    avoid.  Trip a wire if any code path reads .rdd."""
    path = str(tmp_path / "tiny4")
    spark.range(10).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)

    def boom(self):
        raise AssertionError("scan_split_estimate must not touch df.rdd")

    from pyspark.sql import DataFrame

    monkeypatch.setattr(DataFrame, "rdd", property(boom))
    assert scan_split_estimate(df) is not None
    fan_out(df)
