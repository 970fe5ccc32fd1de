"""Approximate aggregates: HLL distinct within error bounds of exact."""

from __future__ import annotations

import pyspark.sql.functions as F

from tg_reporting_etl_spark.sources.readers import load_table


def test_approx_count_distinct_error_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) <= max(3, 0.05 * row.exact)


def test_percentile_approx_close_to_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.expr("percentile_approx(value, 0.5, 1000)").alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) <= 0.05 * max(1.0, abs(row.exact))


def test_hll_sketch_merge_matches_trailing_exact(spark, sf_dir):
    """The 100 TB WAU path: one HLL sketch per day (hll_sketch_agg),
    merged per trailing window with hll_union_agg — no rescan of raw
    events per window — lands within HLL error of the exact operator."""
    from tg_reporting_etl_spark.operators.sessions import trailing_active_users

    ev = load_table(spark, sf_dir, "events")
    day_sketches = (
        ev.select(F.to_date("ts").alias("active_date"), "user_id")
        .groupBy("active_date")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    fanned = day_sketches.select(
        "sk",
        F.explode(
            F.sequence(F.col("active_date"), F.date_add("active_date", 6))
        ).alias("report_date"),
    )
    approx = {
        r.report_date: r.n
        for r in fanned.groupBy("report_date")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("n"))
        .collect()
    }
    exact = {r.report_date: r.n_active for r in trailing_active_users(ev, 7).collect()}
    assert set(approx) == set(exact)
    for d, n in exact.items():
        assert abs(approx[d] - n) <= max(5, 0.05 * n), (d, approx[d], n)
