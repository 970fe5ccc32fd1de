"""trans_summary tier family — wallet-transfer rollups.

Reference: task-executor/trans_summary/{trans_summary_5min,_1h,_1d,_1m}.py.
Grain: (platform, site_code, player_name, country) × time window; measures
are conditional sums over IN/OUT transfers plus the composite
``trans_out_lost_amount`` (trans_summary_5min.py:67-99).

Set-oriented redesign: the reference loops one 5-minute task at a time
(iterrows, trans_summary_5min.py:23); here ONE job computes every window
in ``[gte, lt)`` — the 5-min bucket is just another group key, so a day is
288 windows in a single shuffle instead of 288 serial SQL round-trips.
Each coarser tier is a sum-of-sums over the tier below
(trans_summary_1h.py:54,68-84), preserving the reference's materialized
rollup cascade; at 100 TB the 1h/1d/1m tiers never rescan the raw log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions.fanout import fan_out
from tg_reporting_etl_spark.functions.core import (
    cond_count,
    cond_sum,
    wildcard_filter,
    window_time_keys,
)

GROUP_KEYS = ["platform", "site_code", "player_name", "country"]
MEASURES = [
    "trans_in_amount",
    "trans_out_amount",
    "trans_in_count",
    "trans_out_count",
    "trans_out_lost_amount",
]


def _base_aggs(pvl: DataFrame) -> list[Column]:
    """The five measures of trans_summary_5min.py:73-79."""
    is_in = pvl.trade_type == "IN"
    is_out = pvl.trade_type == "OUT"
    return [
        cond_sum(is_in, pvl.value).alias("trans_in_amount"),
        cond_sum(is_out, pvl.value).alias("trans_out_amount"),
        cond_count(is_in).cast("long").alias("trans_in_count"),
        cond_count(is_out).cast("long").alias("trans_out_count"),
        (
            cond_sum(is_out, pvl.before_value)
            - cond_sum(is_out, pvl.after_value)
            - cond_sum(is_out, pvl.value)
        ).alias("trans_out_lost_amount"),
    ]


def trans_summary_5min(
    pvl: DataFrame,
    gte: str,
    lt: str,
    platform: str = "ALL",
    site_code: str = "ALL",
) -> DataFrame:
    """5-minute tier from the raw wallet log (trans_summary_5min.py:67-99).

    Filters: SUCCESS only (:83), half-open [gte, lt) on trade_time
    (:84-85), ALL-wildcard platform/site (:56-65).  The 5-min tumbling
    window is F.window — pushdown-friendly and identical to DuckDB's
    time_bucket in the oracle.
    """
    filtered = wildcard_filter(pvl, platform=platform, site_code=site_code).filter(
        (pvl.trade_status == "SUCCESS")
        & (pvl.trade_time >= F.lit(gte).cast("timestamp"))
        & (pvl.trade_time < F.lit(lt).cast("timestamp"))
    )
    # The (window, keys) grain barely compresses (groups ≈ rows), so
    # map-side partial aggregation is pure overhead; pre-partitioning by
    # the group keys replaces the agg exchange (subset hash satisfies the
    # clustering requirement) AND parallelizes the decode when the scan
    # has fewer splits than cores (single-row-group files can't split).
    # Split count comes from scan-split arithmetic (functions/fanout.py)
    # — never an RDD conversion; no-op at cluster scale.
    filtered = fan_out(filtered, *GROUP_KEYS)
    win = F.window("trade_time", "5 minutes")
    agg = filtered.groupBy(win.alias("w"), *GROUP_KEYS).agg(*_base_aggs(pvl))
    return agg.select(*GROUP_KEYS, *MEASURES, *window_time_keys(F.col("w.start"), "5min"))


def _rollup(lower: DataFrame, tier: str) -> DataFrame:
    """Sum-of-sums rollup of a finer tier (trans_summary_1h.py:68-84).

    Re-keys the finer tier's start_time to the coarser window and re-sums
    the same measures; counts stay exact because they are sums of counts.
    """
    unit = {"1h": "hour", "1d": "day", "1m": "month"}[tier]
    start = F.date_trunc(unit, F.col("start_time"))
    aggs = [F.sum(m).alias(m) for m in MEASURES]
    agg = lower.groupBy(start.alias("w_start"), *GROUP_KEYS).agg(*aggs)
    return agg.select(*GROUP_KEYS, *MEASURES, *window_time_keys(F.col("w_start"), tier))


def trans_summary_1h(five_min: DataFrame) -> DataFrame:
    """1-hour tier reading the 5-min tier (trans_summary_1h.py:54,68-84)."""
    return _rollup(five_min, "1h")


def trans_summary_1d(one_hour: DataFrame) -> DataFrame:
    """1-day tier reading the 1-hour tier (trans_summary_1d.py:56,70-85)."""
    return _rollup(one_hour, "1d")


def trans_summary_1m(one_day: DataFrame) -> DataFrame:
    """1-month tier reading the 1-day tier (trans_summary_1m.py:55,69-85).

    The 1d tier has no start_time column (its key is the int
    summary_date), so rebuild a timestamp from the date key first.
    """
    with_ts = one_day.withColumn(
        "start_time",
        F.to_timestamp(F.col("summary_date").cast("string"), "yyyyMMdd"),
    )
    return _rollup(with_ts, "1m")
