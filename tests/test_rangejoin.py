"""Bucketed range join (functions/rangejoin.py): containment truth
table incl. half-open boundaries and bucket-straddling intervals; the
no-cartesian plan.  Cross-engine parity runs through the
events_incident_range_join oracle (DuckDB native inequality join)."""

from __future__ import annotations

import contextlib
import datetime as dt
import io

import pyspark.sql.functions as F

from tg_reporting_etl_spark.functions.rangejoin import bucketed_range_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _t(secs):
    return T0 + dt.timedelta(seconds=secs)


def test_containment_truth_table(spark):
    pts = spark.createDataFrame(
        [(1, _t(0)), (2, _t(299)), (3, _t(300)), (4, _t(-1)), (5, _t(601))],
        "pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(10, _t(0), _t(300)), (20, _t(250), _t(650))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r.iid, r.pid)
        for r in bucketed_range_join(pts, ivs, bucket_secs=300).collect()
    }
    assert got == {
        (10, 1),  # start inclusive
        (10, 2),  # inside
        (20, 2),  # 299 in [250, 650) — point can match several intervals
        (20, 3),  # 300 in [250, 650); (10, 3) excluded: end exclusive
        (20, 5),  # 601 in [250, 650)
        # pid 4 (t = -1) precedes every interval
    }


def test_interval_straddles_buckets(spark):
    # interval spans 3 buckets at bucket_secs=60; points in each bucket
    pts = spark.createDataFrame(
        [(i, _t(i * 60 + 30)) for i in range(4)], "pid long, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(1, _t(10), _t(170))], "iid long, start_ts timestamp, end_ts timestamp"
    )
    got = sorted(
        r.pid for r in bucketed_range_join(pts, ivs, bucket_secs=60).collect()
    )
    assert got == [0, 1, 2]  # 30, 90, 150 inside [10, 170); 210 outside


def test_no_duplicate_matches(spark):
    pts = spark.createDataFrame([(1, _t(100))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, _t(0), _t(3000))], "iid long, start_ts timestamp, end_ts timestamp"
    )
    out = bucketed_range_join(pts, ivs, bucket_secs=60)
    assert out.count() == 1  # long interval, one point, exactly one row


def test_plan_is_equi_join_not_bnlj(spark):
    pts = spark.createDataFrame([(1, _t(0))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, _t(0), _t(300))], "iid long, start_ts timestamp, end_ts timestamp"
    )
    df = bucketed_range_join(pts, ivs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rangejoin_random_sweep_vs_python_model(spark):
    """Seeded random points/intervals (several bucket widths) against
    the O(n*m) pure-Python containment model — boundary-heavy because
    all timestamps land on a coarse grid."""
    import random

    for seed, bucket in ((1, 60), (2, 300), (3, 7)):
        rng = random.Random(seed)
        pts = [(i, _t(rng.randint(0, 600))) for i in range(30)]
        ivs = []
        for j in range(12):
            s = rng.randint(0, 550)
            ivs.append((j, _t(s), _t(s + rng.randint(1, 120))))
        want = {
            (j, i)
            for j, s, e in ivs
            for i, ts in pts
            if s <= ts < e
        }
        got = {
            (r.iid, r.pid)
            for r in bucketed_range_join(
                spark.createDataFrame(pts, "pid long, ts timestamp"),
                spark.createDataFrame(ivs, "iid long, start_ts timestamp, end_ts timestamp"),
                bucket_secs=bucket,
            ).collect()
        }
        assert got == want, (seed, bucket)
