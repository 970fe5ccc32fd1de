"""Count-min sketch (functions/sketch.py): never-underestimate,
error bound, merge = rebuild, bounded table size, broadcast probe."""

from __future__ import annotations

import pyspark.sql.functions as F

from tg_reporting_etl_spark.functions import sketch as sk

W, D = 64, 4  # deliberately tight so collisions actually happen


def _stream(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


COUNTS = {f"key{i}": (i % 7) + 1 for i in range(200)}  # 200 keys into 64 buckets


def test_never_underestimates_and_bounded_error(spark):
    stream = _stream(spark, COUNTS)
    counters = sk.cms_build(stream, "k", W, D)
    keys = spark.createDataFrame([(k,) for k in COUNTS], "k string")
    est = {r.k: r.cms_est for r in sk.cms_estimate(keys, "k", counters, W, D).collect()}
    n = sum(COUNTS.values())
    import math

    eps_n = math.e / W * n  # classic bound, holds w.p. 1-(1/2)^D per key
    violations = sum(1 for k, c in COUNTS.items() if est[k] - c > eps_n)
    assert all(est[k] >= c for k, c in COUNTS.items())  # structural
    assert violations <= len(COUNTS) * 0.1
    # collisions DID happen (the test has teeth)
    assert any(est[k] > c for k, c in COUNTS.items())


def test_absent_key_estimates_only_collision_mass(spark):
    counters = sk.cms_build(_stream(spark, {"a": 50}), "k", W, D)
    est = {
        r.k: r.cms_est
        for r in sk.cms_estimate(
            spark.createDataFrame([("zzz",)], "k string"), "k", counters, W, D
        ).collect()
    }
    assert est["zzz"] in (0, 50)  # either clean buckets or full collision


def test_merge_equals_rebuild(spark):
    a = {f"x{i}": 3 for i in range(50)}
    b = {f"y{i}": 5 for i in range(50)}
    merged = sk.cms_merge(
        sk.cms_build(_stream(spark, a), "k", W, D),
        sk.cms_build(_stream(spark, b), "k", W, D),
    )
    rebuilt = sk.cms_build(_stream(spark, {**a, **b}), "k", W, D)
    diff = merged.join(rebuilt, ["d", "idx"], "full").filter(
        F.coalesce(merged["c"], F.lit(0)) != F.coalesce(rebuilt["c"], F.lit(0))
    )
    assert diff.count() == 0


def test_table_bounded_by_d_times_w(spark):
    counters = sk.cms_build(_stream(spark, {f"k{i}": 2 for i in range(500)}), "k", W, D)
    assert counters.count() <= W * D


def test_probe_broadcasts_counters(spark):
    import contextlib
    import io

    counters = sk.cms_build(_stream(spark, {"a": 1}), "k", W, D)
    out = sk.cms_estimate(
        spark.createDataFrame([("a",)], "k string"), "k", counters, W, D
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
