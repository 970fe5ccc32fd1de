"""Salted two-stage aggregation equals the plain group-by."""

from __future__ import annotations

import pyspark.sql.functions as F

from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.functions.skew import salted_agg


def test_salted_agg_matches_plain(spark, sf_dir):
    ppl = td.player_profit_log(spark, sf_dir)
    plain = {
        (r.platform, r.player_name): (round(r.b, 4), r.n)
        for r in ppl.groupBy("platform", "player_name")
        .agg(F.sum("bet").alias("b"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r.platform, r.player_name): (round(r.bet, 4), r.n)
        for r in salted_agg(ppl, ["platform", "player_name"], ["bet"], count_col="n").collect()
    }
    assert plain == salted
