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
