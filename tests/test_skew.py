"""Salted two-stage aggregation equals the plain group-by; skew profile."""

from __future__ import annotations

import pyspark.sql.functions as F

from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.functions.skew import key_skew_profile, salted_agg


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


def test_key_skew_profile_on_constructed_skew(spark):
    import pandas as pd

    # 60 rows of whale, 10+10 of two mid keys, 20 distinct singletons, 2 null
    rows = (
        [("whale",)] * 60
        + [("mid_a",)] * 10
        + [("mid_b",)] * 10
        + [(f"one_{i:02d}",) for i in range(20)]
        + [(None,)] * 2
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k"]))
    out = key_skew_profile(df, ["k"], top_n=3).collect()
    # null rows excluded: total=100, n_keys=23, mean cnt = 100/23
    assert [r.k for r in out] == ["whale", "mid_a", "mid_b"]  # ties by key asc
    top = out[0]
    assert top.cnt == 60
    assert top.share == round(60 / 100, 6)
    assert top.skew_ratio == round(60 * 23 / 100, 6)


def test_key_skew_profile_flat_keys_ratio_one(spark):
    import pandas as pd

    rows = [(f"k{i}", j) for i in range(8) for j in range(5)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]))
    out = key_skew_profile(df, ["k"], top_n=100).collect()
    assert len(out) == 8
    assert all(r.skew_ratio == 1.0 and r.share == round(5 / 40, 6) for r in out)


def test_key_skew_profile_composite_keys(spark):
    import pandas as pd

    rows = [("P1", "alice")] * 6 + [("P1", "bob")] * 3 + [("P2", "alice")] * 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["platform", "player"]))
    out = key_skew_profile(df, ["platform", "player"], top_n=2).collect()
    assert [(r.platform, r.player, r.cnt) for r in out] == [
        ("P1", "alice", 6),
        ("P1", "bob", 3),
    ]
    # total=10, n_keys=3: mean=10/3
    assert out[0].share == 0.6
    assert out[0].skew_ratio == round(6 / (10 / 3), 6)
