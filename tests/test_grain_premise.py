"""Standing enforcement of the _grid5 parity proof's premises (r16
verdict task 1 + r16 ADVICE 2).

operators/risk_ctrl._grid5's cross-engine determinism proof rests on
two data facts that used to be one-off sf0.1 measurements in SURVEY §6:

1. **grain**: every amount whose per-(keys, day) sums feed the
   wma/wmasd snap is a rational with <= 5-decimal grain (the parity
   argument makes the floor's half-point boundaries unreachable for
   sum/7 and stddev_pop of such data);
2. **magnitude**: the snapped values stay far below ~1e9, where the
   ``x*1e5`` multiply's own rounding error would cross the 1/14-step
   half-point clearance.

These tests measure both premises on the ACTUAL fixture columns that
transitively feed the trailing stats — ``player_profit_log.bet`` /
``profit`` (b_amount / profit_amount in the 1d tiers, player AND game
grain) and both wallet logs' ``value`` (trans_in/out_amount, whose
difference is the net_trans measure) — at every shipped sf, and
mutation-test the detector with an injected 6-decimal value.
"""

from __future__ import annotations

import os

import pytest

from tg_reporting_etl_spark.operators.risk_ctrl import amount_grain

_SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

#: adapter -> the columns whose sums reach _grid5 (plus win/fee, which
#: feed other 1d-tier measures the rtp family re-aggregates)
_AUDIT = {
    "player_profit_log": ["bet", "win", "profit", "fee"],
    "player_value_log_lineitem": ["value"],
    "player_value_log": ["value"],
}

GRAIN_BOUND = 5
MAGNITUDE_BOUND = 1e9


@pytest.mark.parametrize("sf", _SF_DIRS, ids=[os.path.basename(d) for d in _SF_DIRS])
def test_fixture_amount_grain_within_proof_bound(spark, sf):
    from tg_reporting_etl_spark.adapters import testdata as td

    for adapter, cols in _AUDIT.items():
        df = getattr(td, adapter)(spark, sf)
        grains = amount_grain(df, cols, max_d=GRAIN_BOUND)
        for c, g in grains.items():
            assert g is not None and g <= GRAIN_BOUND, (
                f"{adapter}.{c} at {sf}: grain {g} exceeds the _grid5 proof "
                f"bound of {GRAIN_BOUND} decimals — the half-point "
                "unreachability parity argument no longer holds for this data"
            )


@pytest.mark.parametrize("sf", _SF_DIRS, ids=[os.path.basename(d) for d in _SF_DIRS])
def test_daily_sum_magnitude_within_grid5_safe_range(spark, sf):
    """The other _grid5 premise (r16 ADVICE 2): |snapped value| must
    stay well under ~1e9, where the x*1e5 multiply's rounding error
    would exceed the half-point clearance.  The snapped values are
    bounded by the per-(keys, day) daily sums, so measure the max
    |daily sum| at EVERY grain the snap runs on: player AND game
    b/profit, and the wallet net (trans_out - trans_in).  Measured
    sf0.1 maxima are ~9.2e5 (game-grain bet); asserting < 1e7 keeps a
    10x margin at the shipped sfs and leaves the 10x probe (~9.2e6)
    and another 100x of growth inside the 1e9 safe range."""
    import pyspark.sql.functions as F

    from tg_reporting_etl_spark.adapters import testdata as td
    from tg_reporting_etl_spark.operators.risk_ctrl import GAME_KEYS, PLAYER_KEYS

    bound = MAGNITUDE_BOUND / 100

    def day_col(ts):
        return F.year(ts) * 10000 + F.month(ts) * 100 + F.dayofmonth(ts)

    ppl = td.player_profit_log(spark, sf).withColumn("_d", day_col(F.col("round_time")))
    for keys, tag in ((PLAYER_KEYS, "player"), (GAME_KEYS, "game")):
        row = (
            ppl.groupBy("_d", *keys)
            .agg(F.sum("bet").alias("b"), F.sum("profit").alias("p"))
            .agg(F.max(F.abs(F.col("b"))).alias("b"), F.max(F.abs(F.col("p"))).alias("p"))
            .collect()[0]
        )
        assert row["b"] < bound, (tag, row["b"])
        assert row["p"] < bound, (tag, row["p"])

    net = (
        td.player_value_log_lineitem(spark, sf)
        .withColumn("_d", day_col(F.col("trade_time")))
        .groupBy("_d", *PLAYER_KEYS)
        .agg(
            F.sum(
                F.when(F.col("trade_type") == "OUT", F.col("value")).otherwise(-F.col("value"))
            ).alias("n")
        )
        .agg(F.max(F.abs(F.col("n"))).alias("n"))
        .collect()[0]
    )
    assert net["n"] < bound, ("trans_net", net["n"])


def test_injected_six_decimal_value_is_detected(spark):
    """Red path / mutation test: a single 6-decimal value anywhere in a
    column must push its measured grain past the bound."""
    rows = [(1.25,), (100.0,), (0.123456,), (7.5,)]
    df = spark.createDataFrame(rows, "x double")
    g = amount_grain(df, ["x"], max_d=GRAIN_BOUND)
    assert g["x"] is None  # not explainable within 5 decimals
    g6 = amount_grain(df, ["x"], max_d=6)
    assert g6["x"] == 6  # and exactly 6 once allowed


def test_grain_detector_is_fp_honest(spark):
    """Representation noise must NOT inflate the measured grain: true
    2- and 4-decimal values stored as doubles (including products like
    price*(1-disc), the fixture's own shape) measure at their true
    grain, and large-magnitude 2-decimal values don't false-positive."""
    two = [(1234.56,), (0.01,), (99999999.99,)]
    assert amount_grain(spark.createDataFrame(two, "x double"), ["x"])["x"] == 2
    import pyspark.sql.functions as F

    # products of 2-decimal x 2-decimal rationals: grain 4, computed in FP
    prod = (
        spark.range(1, 2000)
        .select(
            (
                (F.col("id") % 9000 + 1000).cast("double") / 100
                * (1 - (F.col("id") % 100).cast("double") / 100)
            ).alias("x")
        )
    )
    assert amount_grain(prod, ["x"])["x"] <= 4
    # negatives and exact integers
    mix = [(-12.5,), (0.0,), (42.0,)]
    assert amount_grain(spark.createDataFrame(mix, "x double"), ["x"])["x"] == 1
