"""player_summary family: revenue split, rtp semantics, risky flags."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.operators.player_summary import (
    player_summary_1d,
    player_summary_1h,
    player_summary_5min,
)

GTE, LT = "1995-01-01 00:00:00", "2002-01-01 00:00:00"


@pytest.fixture(scope="module")
def p5(spark, sf_dir):
    ppl = td.player_profit_log(spark, sf_dir)
    sites = td.game_sites(spark, sf_dir)
    return player_summary_5min(ppl, sites, GTE, LT).cache()


def test_revenue_split_conserved(p5):
    """p_before == p_after + tg_after at every row (split by ratio)."""
    bad = p5.filter(
        F.abs(F.col("p_before_amount") - (F.col("p_after_amount") + F.col("tg_after_amount"))) > 1e-6
    ).count()
    assert bad == 0


def test_missing_site_ratio_defaults_to_zero(p5):
    """(GEA, TEST) is absent from game_sites -> ratio 0, p_after == profit."""
    rows = p5.filter((F.col("platform") == "GEA") & (F.col("site_code") == "TEST"))
    assert rows.count() > 0
    assert rows.filter(F.col("ratio") != 0.0).count() == 0
    assert rows.filter(F.abs(F.col("p_after_amount") - F.col("profit_amount")) > 1e-9).count() == 0


def test_rtp_is_ratio_of_sums(p5):
    sample = p5.filter(F.col("b_amount") > 0).limit(100).collect()
    for r in sample:
        assert abs(r.rtp - r.profit_amount / r.b_amount) < 1e-9


def test_robots_excluded(spark, sf_dir):
    ppl = td.player_profit_log(spark, sf_dir)
    sites = td.game_sites(spark, sf_dir)
    robots_only = ppl.filter(ppl.is_robot == 1)
    assert robots_only.count() > 0  # adapter generates robots
    out = player_summary_5min(robots_only, sites, GTE, LT)
    assert out.count() == 0  # and the operator filters them


def test_rollup_preserves_totals(p5):
    p1d = player_summary_1d(player_summary_1h(p5))
    t5 = p5.agg(F.sum("b_amount"), F.sum("profit_amount"), F.sum("b_count")).first()
    t1d = p1d.agg(F.sum("b_amount"), F.sum("profit_amount"), F.sum("b_count")).first()
    assert abs(t5[0] - t1d[0]) < 1e-4
    assert abs(t5[1] - t1d[1]) < 1e-4
    assert t5[2] == t1d[2]
