"""player_summary tier family — bet-round profit/RTP rollups.

Reference: task-executor/player_summary/{player_summary_5min,_1h,_1d,_1m}.py.
Grain: (platform, site_code, game_code, player_name, country) × window.
Measures (player_summary_5min.py:77-89): plain sums, clamped sums for
free/jp, COUNT(bet), ratio-of-sums rtp with ÷0→0, revenue-share split via
a broadcast join to game_sites, and a rule-based is_risky flag
(player_summary_5min.py:134-144, thresholds report_config.py:72-77).

Set-oriented as in trans_summary: one job per tier covers every window
and every (platform, site, game) slice at once; coarser tiers re-sum the
tier below (player_summary_1h.py:71-99) and *recompute* rtp and is_risky
at their own grain rather than averaging them.

Documented divergence from the reference: the reference's 1h SELECT list
drops tg_after_amount (player_summary_1h.py:72-92 has no tg_after), so at
1d/1m the column degrades to DB-default noise (player_summary_1d.py:93
sums it from a column its own source never wrote).  This engine carries
tg_after_amount through every tier as a true sum — the internally
consistent reading of the 5min definition (SURVEY.md §4 delta handling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions.fanout import fan_out
from tg_reporting_etl_spark.config import PLAYER_SUMMARY_RTP
from tg_reporting_etl_spark.functions.core import (
    clamped_sum,
    safe_div,
    wildcard_filter,
    window_time_keys,
)

GROUP_KEYS = ["platform", "site_code", "game_code", "player_name", "country"]
SUM_MEASURES = [
    "b_amount",
    "w_amount",
    "fee_amount",
    "profit_amount",
    "refund_amount",
    "normal_amount",
    "bonus_amount",
    "free_amount",
    "jp_amount",
    "valid_amount",
    "cancel_amount",
    "p_before_amount",
    "p_after_amount",
    "tg_after_amount",
]
OUT_COLUMNS = ["b_count", *SUM_MEASURES, "ratio", "rtp", "is_risky"]


def with_risky_flag(df: DataFrame) -> Column | DataFrame:
    """is_risky rules (player_summary_5min.py:134-144).

    1 when profit >= profit_threshold AND b_count >= bet_count_threshold
    AND rtp >= rtp_threshold; unconditionally 1 when profit >=
    profit_unconditional; else 0.  Recomputed at every tier.
    """
    cfg = PLAYER_SUMMARY_RTP
    risky = (
        (F.col("profit_amount") >= cfg["profit_threshold"])
        & (F.col("b_count") >= cfg["bet_count_threshold"])
        & (F.col("rtp") >= cfg["rtp_threshold"])
    ) | (F.col("profit_amount") >= cfg["profit_unconditional"])
    return df.withColumn("is_risky", F.when(risky, 1).otherwise(0))


def base_player_aggs() -> list[Column]:
    """The 5-min measure expressions (player_summary_5min.py:77-89) —
    shared by the batch operator and the streaming twin (one definition,
    two runtimes, same as trans_summary's ``_base_aggs``)."""
    return [
        F.count("bet").alias("b_count"),
        F.sum("bet").alias("b_amount"),
        F.sum("win").alias("w_amount"),
        F.sum("fee").alias("fee_amount"),
        F.sum("profit").alias("profit_amount"),
        F.sum("refund").alias("refund_amount"),
        F.sum("normal_value").alias("normal_amount"),
        F.sum("bonus_value").alias("bonus_amount"),
        clamped_sum(F.col("free_value")).alias("free_amount"),
        clamped_sum(F.col("jp_value")).alias("jp_amount"),
        F.sum("valid_value").alias("valid_amount"),
        F.sum("cancel_value").alias("cancel_amount"),
    ]


def derive_player_measures(agg: DataFrame) -> DataFrame:
    """rtp, revenue split and is_risky over an aggregated frame that
    already carries a ``ratio`` column — row-wise projections, recomputed
    identically at every tier and in both runtimes."""
    derived = (
        agg.withColumn("rtp", safe_div(F.col("profit_amount"), F.col("b_amount")))
        .withColumn("p_before_amount", F.col("profit_amount"))
        .withColumn("p_after_amount", F.col("profit_amount") * (1 - F.col("ratio")))
        .withColumn("tg_after_amount", F.col("profit_amount") * F.col("ratio"))
    )
    return with_risky_flag(derived)


def site_ratio_dim(game_sites: DataFrame) -> DataFrame:
    """(platform, site_code, ratio) broadcast dim."""
    return F.broadcast(game_sites.select("platform", F.col("code").alias("site_code"), "ratio"))


def player_summary_5min(
    ppl: DataFrame,
    game_sites: DataFrame,
    gte: str,
    lt: str,
    platform: str = "ALL",
    site_code: str = "ALL",
    game_code: str = "ALL",
) -> DataFrame:
    """5-minute tier from the raw bet-round log (player_summary_5min.py:57-144).

    game_sites is a handful of rows — broadcast it explicitly so the join
    never shuffles the fact side (the reference reads the whole dim into
    memory, player_summary_5min.py:109-119; broadcast hash join is the
    Spark-native equivalent).
    """
    f = wildcard_filter(ppl, platform=platform, site_code=site_code, game_code=game_code).filter(
        (ppl.is_robot == 0)
        & (ppl.round_time >= F.lit(gte).cast("timestamp"))
        & (ppl.round_time < F.lit(lt).cast("timestamp"))
    )
    # see trans_summary_5min: groups ≈ rows at this grain, so pre-
    # partitioning by the group keys replaces the agg exchange and
    # parallelizes unsplittable single-row-group scans; split count from
    # scan-split arithmetic (functions/fanout.py), no RDD conversion;
    # no-op on a cluster-scale input
    f = fan_out(f, *GROUP_KEYS)
    win = F.window("round_time", "5 minutes")
    agg = f.groupBy(win.alias("w"), *GROUP_KEYS).agg(*base_player_aggs())

    joined = agg.join(site_ratio_dim(game_sites), on=["platform", "site_code"], how="left").withColumn(
        "ratio", F.coalesce(F.col("ratio"), F.lit(0.0))
    )
    flagged = derive_player_measures(joined)
    return flagged.select(*GROUP_KEYS, *OUT_COLUMNS, *window_time_keys(F.col("w.start"), "5min"))


def _rollup(lower: DataFrame, tier: str) -> DataFrame:
    """Sum-of-sums rollup with per-tier rtp/is_risky recompute
    (player_summary_1h.py:71-99; ratio rides along as a per-site constant,
    the reference's bare non-aggregated GROUP BY column)."""
    unit = {"1h": "hour", "1d": "day", "1m": "month"}[tier]
    start = F.date_trunc(unit, F.col("start_time"))
    agg = lower.groupBy(start.alias("w_start"), *GROUP_KEYS).agg(
        F.sum("b_count").cast("long").alias("b_count"),
        *[F.sum(m).alias(m) for m in SUM_MEASURES],
        F.min("ratio").alias("ratio"),
    )
    agg = agg.withColumn("rtp", safe_div(F.col("profit_amount"), F.col("b_amount")))
    flagged = with_risky_flag(agg)
    return flagged.select(*GROUP_KEYS, *OUT_COLUMNS, *window_time_keys(F.col("w_start"), tier))


def player_summary_1h(five_min: DataFrame) -> DataFrame:
    """1-hour tier reading the 5-min tier (player_summary_1h.py:55-114)."""
    return _rollup(five_min, "1h")


def player_summary_1d(one_hour: DataFrame) -> DataFrame:
    """1-day tier reading the 1-hour tier (player_summary_1d.py:58-113)."""
    return _rollup(one_hour, "1d")


def player_summary_1m(one_day: DataFrame) -> DataFrame:
    """1-month tier reading the 1-day tier (player_summary_1m.py:57-111)."""
    with_ts = one_day.withColumn(
        "start_time", F.to_timestamp(F.col("summary_date").cast("string"), "yyyyMMdd")
    )
    return _rollup(with_ts, "1m")
