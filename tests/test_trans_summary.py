"""trans_summary tier family: cascade consistency + sink idempotency.

SURVEY.md §5.2-5.3: each tier must equal direct aggregation from raw at
that tier's grain, and re-running a window job must leave the table
unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.operators.trans_summary import (
    GROUP_KEYS,
    MEASURES,
    trans_summary_1d,
    trans_summary_1h,
    trans_summary_5min,
)
from tg_reporting_etl_spark.sources.writers import overwrite_window_partitions

GTE, LT = "2024-01-01 00:00:00", "2024-02-01 00:00:00"


@pytest.fixture(scope="module")
def tiers(spark, sf_dir):
    pvl = td.player_value_log(spark, sf_dir)
    t5 = trans_summary_5min(pvl, GTE, LT).cache()
    t1h = trans_summary_1h(t5).cache()
    return {"pvl": pvl, "5min": t5, "1h": t1h, "1d": trans_summary_1d(t1h)}


def _direct_daily(pvl):
    """Direct day-grain aggregation from the raw log (bypassing tiers)."""
    f = pvl.filter((pvl.trade_status == "SUCCESS") & (pvl.trade_time >= GTE) & (pvl.trade_time < LT))
    day = F.date_trunc("day", f.trade_time)
    is_in = f.trade_type == "IN"
    is_out = f.trade_type == "OUT"
    return (
        f.groupBy(day.alias("d"), *GROUP_KEYS)
        .agg(
            F.sum(F.when(is_in, f.value).otherwise(0.0)).alias("trans_in_amount"),
            F.sum(F.when(is_out, f.value).otherwise(0.0)).alias("trans_out_amount"),
            F.sum(F.when(is_in, 1).otherwise(0)).cast("long").alias("trans_in_count"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("trans_out_count"),
            (
                F.sum(F.when(is_out, f.before_value).otherwise(0.0))
                - F.sum(F.when(is_out, f.after_value).otherwise(0.0))
                - F.sum(F.when(is_out, f.value).otherwise(0.0))
            ).alias("trans_out_lost_amount"),
        )
        .select(
            *GROUP_KEYS,
            *MEASURES,
            (F.year("d") * 10000 + F.month("d") * 100 + F.dayofmonth("d")).cast("int").alias("summary_date"),
        )
    )


def test_cascade_equals_direct_daily(tiers):
    """5min→1h→1d sum-of-sums == one-shot day aggregation (within fp tol)."""
    cascade = tiers["1d"].toPandas().set_index([*GROUP_KEYS, "summary_date"]).sort_index()
    direct = _direct_daily(tiers["pvl"]).toPandas().set_index([*GROUP_KEYS, "summary_date"]).sort_index()
    assert len(cascade) == len(direct)
    assert (cascade.index == direct.index).all()
    for m in MEASURES:
        assert (cascade[m] - direct[m]).abs().max() < 1e-6, m


def test_counts_survive_rollup(tiers):
    t5 = tiers["5min"].agg(F.sum("trans_in_count"), F.sum("trans_out_count")).first()
    t1d = tiers["1d"].agg(F.sum("trans_in_count"), F.sum("trans_out_count")).first()
    assert tuple(t5) == tuple(t1d)


def test_overwrite_window_idempotent(tiers, tmp_path):
    """Re-running a window write replaces, never duplicates (S3 semantics)."""
    out = str(tmp_path / "trans_summary_5min")
    df = tiers["5min"]
    overwrite_window_partitions(df, out, ["summary_date"])
    first = df.sparkSession.read.parquet(out).count()
    overwrite_window_partitions(df, out, ["summary_date"])
    second = df.sparkSession.read.parquet(out).count()
    assert first == second == df.count()


def test_wildcard_filter_narrow(tiers, spark, sf_dir):
    pvl = td.player_value_log(spark, sf_dir)
    narrowed = trans_summary_5min(pvl, GTE, LT, platform="UFA", site_code="TG")
    got = narrowed.select("platform", "site_code").distinct().collect()
    assert {(r.platform, r.site_code) for r in got} <= {("UFA", "TG")}


def test_append_sink(tiers, tmp_path):
    """S2: plain append accumulates (vs the idempotent overwrite)."""
    from tg_reporting_etl_spark.sources.writers import write_append

    out = str(tmp_path / "append_sink")
    df = tiers["5min"].limit(50)
    write_append(df, out)
    write_append(df, out)
    assert df.sparkSession.read.parquet(out).count() == 2 * df.count()
