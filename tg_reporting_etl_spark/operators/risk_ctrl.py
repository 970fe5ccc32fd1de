"""risk_ctrl 1d family — Bollinger-band-style risk scoring.

Reference: task-executor/risk_ctrl/{risk_ctrl_player_1d,risk_ctrl_game_1d}.py.
For a target day D: current-day aggregates (from the 1h tier) are
compared against 8-day trailing statistics (from the 1d tier,
``[D-8, D)`` — the reference calls it 7-day but the window is 8 days
wide, SURVEY §4 delta 5) and scored as sigma distances weighted into a
risk_score (risk_ctrl_player_1d.py:157-234).

Bug-compatible floors (SURVEY §4 delta 6, preserved literally):
the p/trans floor *conditions* compare against the **b** defaults while
the replacement values use their own defaults
(risk_ctrl_player_1d.py:193-202) — e.g.
``p_wma < def_b_wma  ->  p_wma := def_p_wma * country_rate``.

Everything is pure column expressions over two chained groupBys + three
left joins — no UDFs, fully codegen'd; the trailing stats are a
re-aggregation exactly like the reference (not a window function) so the
oracle can mirror it CTE-for-CTE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tg_reporting_etl_spark.config import RISK_CTRL_1D
from tg_reporting_etl_spark.functions.core import safe_div

PLAYER_KEYS = ["platform", "site_code", "player_name", "country"]
GAME_KEYS = ["platform", "site_code", "game_code", "country"]


def _country_rate() -> Column:
    """country -> currency-rate literal map (report_config.py:35-40);
    a 4-entry map literal, the map-side-join reading of SURVEY §2.3 J7."""
    pairs: list[Column] = []
    for k, v in RISK_CTRL_1D["country_rate"].items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)[F.col("country")]


def _floored(col: str, cond_floor: float, value_floor: float, rate: Column) -> Column:
    """reference floor rule: ``col < cond_floor -> value_floor * rate``
    (risk_ctrl_player_1d.py:185-202)."""
    return F.when(F.col(col) < cond_floor, F.lit(value_floor) * rate).otherwise(F.col(col))


def _upper_sigma(cur: Column, wma: Column, wmasd: Column) -> Column:
    """abs(cur-wma)/wmasd when cur >= wma else 0; inf/NaN -> 0
    (risk_ctrl_player_1d.py:206-214)."""
    return F.coalesce(F.when(cur >= wma, F.abs(cur - wma) / wmasd).otherwise(F.lit(0.0)), F.lit(0.0))


def _trailing_stats(tier_1d: DataFrame, keys: list[str], gte_key: int, lt_key: int, prefix_map: dict[str, str]) -> DataFrame:
    """Two-level trailing aggregation (A5): per-day sums re-aggregated to
    SUM/7 means and population stddevs (risk_ctrl_player_1d.py:97-130;
    MySQL STDDEV is population -> stddev_pop, SURVEY §4 delta 2).

    ``prefix_map`` maps source measure -> output prefix, e.g.
    {"b_amount": "b", "profit_amount": "p"}.
    """
    daily = (
        tier_1d.filter((F.col("summary_date") >= gte_key) & (F.col("summary_date") < lt_key))
        .groupBy("summary_date", *keys)
        .agg(*[F.sum(src).alias(f"_daily_{pfx}") for src, pfx in prefix_map.items()])
    )
    aggs = []
    for pfx in prefix_map.values():
        aggs.append((F.sum(f"_daily_{pfx}") / 7).alias(f"{pfx}_wma"))
        aggs.append(F.stddev_pop(f"_daily_{pfx}").alias(f"{pfx}_wmasd"))
    return daily.groupBy(*keys).agg(*aggs)


def _current_day(tier_1h: DataFrame, keys: list[str], date_key: int) -> DataFrame:
    """Current-day b/p/rtp from the 1h tier (risk_ctrl_player_1d.py:71-84)."""
    return (
        tier_1h.filter(F.col("summary_date") == date_key)
        .groupBy(*keys)
        .agg(F.sum("b_amount").alias("b_cur"), F.sum("profit_amount").alias("p_cur"))
        .withColumn("rtp_cur", safe_div(F.col("p_cur"), F.col("b_cur")))
    )


def risk_ctrl_player_1d(
    player_1h: DataFrame,
    player_1d: DataFrame,
    trans_1h: DataFrame,
    trans_1d: DataFrame,
    date_key: int,
    lookback_gte_key: int,
) -> DataFrame:
    """Player-grain risk report for day ``date_key``.

    ``lookback_gte_key`` is the int date key of D-8 (the caller owns
    calendar arithmetic so the operator stays a pure table transform).
    """
    cfg = RISK_CTRL_1D["default_value_player"]
    cur = _current_day(player_1h, PLAYER_KEYS, date_key)
    cur_trans = (
        trans_1h.filter(F.col("summary_date") == date_key)
        .groupBy(*PLAYER_KEYS)
        .agg(F.sum(F.col("trans_out_amount") - F.col("trans_in_amount")).alias("net_trans_cur"))
    )
    p_wma = _trailing_stats(
        player_1d, PLAYER_KEYS, lookback_gte_key, date_key, {"b_amount": "b", "profit_amount": "p"}
    )
    # the 1d tier is already day grain, so the "sum" over net_trans is the
    # identity — matches the reference's non-aggregated inner select
    # (risk_ctrl_player_1d.py:120-130)
    trans_net = trans_1d.withColumn(
        "net_trans_amount", F.col("trans_out_amount") - F.col("trans_in_amount")
    )
    t_wma = _trailing_stats(
        trans_net,
        PLAYER_KEYS,
        lookback_gte_key,
        date_key,
        {"net_trans_amount": "net_trans"},
    )
    meta = (
        cur.join(cur_trans, PLAYER_KEYS, "left")
        .join(p_wma, PLAYER_KEYS, "left")
        .join(t_wma, PLAYER_KEYS, "left")
        .na.fill(0.0)
    )

    rate = _country_rate()
    b_wma_f = _floored("b_wma", cfg["def_b_wma"], cfg["def_b_wma"], rate)
    b_wmasd_f = _floored("b_wmasd", cfg["def_b_wmasd"], cfg["def_b_wmasd"], rate)
    # bug-compatible: p/trans conditions use the b defaults (see module doc)
    p_wma_f = _floored("p_wma", cfg["def_b_wma"], cfg["def_p_wma"], rate)
    p_wmasd_f = _floored("p_wmasd", cfg["def_b_wmasd"], cfg["def_p_wmasd"], rate)
    nt_wma_f = _floored("net_trans_wma", cfg["def_b_wma"], cfg["def_p_wma"], rate)
    nt_wmasd_f = _floored("net_trans_wmasd", cfg["def_b_wmasd"], cfg["def_p_wmasd"], rate)

    b_sigma = _upper_sigma(F.col("b_cur"), b_wma_f, b_wmasd_f)
    p_sigma = F.when(F.col("p_cur") <= 0, 0.0).otherwise(
        _upper_sigma(F.col("p_cur"), p_wma_f, p_wmasd_f)
    )
    trans_sigma = F.when(F.col("net_trans_cur") <= 0, 0.0).otherwise(
        _upper_sigma(F.col("net_trans_cur"), nt_wma_f, nt_wmasd_f)
    )
    p_trans_multi = F.coalesce(
        F.when(F.col("net_trans_cur") > 0, F.col("net_trans_cur") / F.col("p_cur")).otherwise(0.0),
        F.lit(0.0),
    )
    w = RISK_CTRL_1D["risk_score_multi"]
    scored = (
        meta.withColumn("b_sigma", b_sigma)
        .withColumn("p_sigma", p_sigma)
        .withColumn("trans_sigma", trans_sigma)
        .withColumn("p_trans_multi", p_trans_multi)
    ).withColumn(
        "risk_score",
        F.col("b_sigma") * w["b"]
        + F.col("p_sigma") * w["wl"]
        + F.col("trans_sigma") * w["trans"]
        + F.col("p_trans_multi") * w["p_trans_multi"],
    )
    return scored.withColumn("summary_date", F.lit(date_key).cast("int"))


def risk_ctrl_game_1d(
    player_1h: DataFrame,
    player_1d: DataFrame,
    date_key: int,
    lookback_gte_key: int,
) -> DataFrame:
    """Game-grain risk report (risk_ctrl_game_1d.py:55-180): b/p only, no
    transfer component, game defaults."""
    cfg = RISK_CTRL_1D["default_value_game"]
    cur = _current_day(player_1h, GAME_KEYS, date_key)
    p_wma = _trailing_stats(
        player_1d, GAME_KEYS, lookback_gte_key, date_key, {"b_amount": "b", "profit_amount": "p"}
    )
    meta = cur.join(p_wma, GAME_KEYS, "left").na.fill(0.0)

    rate = _country_rate()
    b_wma_f = _floored("b_wma", cfg["def_b_wma"], cfg["def_b_wma"], rate)
    b_wmasd_f = _floored("b_wmasd", cfg["def_b_wmasd"], cfg["def_b_wmasd"], rate)
    p_wma_f = _floored("p_wma", cfg["def_b_wma"], cfg["def_p_wma"], rate)
    p_wmasd_f = _floored("p_wmasd", cfg["def_b_wmasd"], cfg["def_p_wmasd"], rate)

    w = RISK_CTRL_1D["risk_score_multi"]
    scored = (
        meta.withColumn("b_sigma", _upper_sigma(F.col("b_cur"), b_wma_f, b_wmasd_f))
        .withColumn(
            "p_sigma",
            F.when(F.col("p_cur") <= 0, 0.0).otherwise(
                _upper_sigma(F.col("p_cur"), p_wma_f, p_wmasd_f)
            ),
        )
        .withColumn("risk_score", F.col("b_sigma") * w["b"] + F.col("p_sigma") * w["wl"])
    )
    return scored.withColumn("summary_date", F.lit(date_key).cast("int"))
