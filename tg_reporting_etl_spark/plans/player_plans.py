"""player_summary tier queries + DuckDB oracles
(SURVEY.md §2: A1, A2, A4, J1, F6, F7, P3-P6).

Oracle mirrors the cascade tier-by-tier, recomputing rtp and is_risky at
each grain exactly as the engine does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tg_reporting_etl_spark.adapters import oracle as orc
from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.config import PLAYER_SUMMARY_RTP as _CFG
from tg_reporting_etl_spark.operators.player_summary import (
    SUM_MEASURES,
    player_summary_1d,
    player_summary_1h,
    player_summary_1m,
    player_summary_5min,
)
from tg_reporting_etl_spark.plans.catalog import LINEITEM_GTE, LINEITEM_LT, register
from tg_reporting_etl_spark.plans.util import cached_df, round_doubles

_KEYS = "platform, site_code, game_code, player_name, country"

_RISKY = (
    f"CAST(CASE WHEN (profit_amount >= {_CFG['profit_threshold']} "
    f"AND b_count >= {_CFG['bet_count_threshold']} "
    f"AND rtp >= {_CFG['rtp_threshold']}) "
    f"OR profit_amount >= {_CFG['profit_unconditional']} THEN 1 ELSE 0 END AS INT) AS is_risky"
)

def _p5_ctes(gte: str, lt: str) -> str:
    """p5 + p5f CTEs over an arbitrary half-open window — the batch
    tiers bake in the full lineitem range; the streaming parity row
    (plans/streaming_plans.py) narrows to a one-year slice to bound
    complete-mode state at the test sfs."""
    return f"""
p5 AS (
  SELECT {_KEYS},
         time_bucket(INTERVAL '5 minutes', round_time) AS start_time,
         CAST(COUNT(bet) AS BIGINT) AS b_count,
         SUM(bet) AS b_amount,
         SUM(win) AS w_amount,
         SUM(fee) AS fee_amount,
         SUM(profit) AS profit_amount,
         SUM(refund) AS refund_amount,
         SUM(normal_value) AS normal_amount,
         SUM(bonus_value) AS bonus_amount,
         SUM(CASE WHEN free_value >= 0 THEN free_value ELSE 0.0 END) AS free_amount,
         SUM(CASE WHEN jp_value >= 0 THEN jp_value ELSE 0.0 END) AS jp_amount,
         SUM(valid_value) AS valid_amount,
         SUM(cancel_value) AS cancel_amount
  FROM player_profit_log
  WHERE is_robot = 0
    AND round_time >= TIMESTAMP '{gte}' AND round_time < TIMESTAMP '{lt}'
  GROUP BY 1, 2, 3, 4, 5, 6
),
p5f AS (
  SELECT *, {_RISKY} FROM (
    SELECT p.*,
           COALESCE(gs.ratio, 0.0) AS ratio,
           CASE WHEN p.b_amount = 0 THEN 0.0 ELSE p.profit_amount / p.b_amount END AS rtp,
           p.profit_amount AS p_before_amount,
           p.profit_amount * (1 - COALESCE(gs.ratio, 0.0)) AS p_after_amount,
           p.profit_amount * COALESCE(gs.ratio, 0.0) AS tg_after_amount
    FROM p5 p
    LEFT JOIN game_sites gs ON p.platform = gs.platform AND p.site_code = gs.code
  )
)"""


_P5_CTES = _p5_ctes(LINEITEM_GTE, LINEITEM_LT)


def _rollup_cte(name: str, prev: str, unit: str) -> str:
    sums = ",\n         ".join(f"SUM({m}) AS {m}" for m in SUM_MEASURES)
    return f"""
{name} AS (
  SELECT *, {_RISKY} FROM (
    SELECT {_KEYS},
           date_trunc('{unit}', start_time) AS start_time,
           CAST(SUM(b_count) AS BIGINT) AS b_count,
           {sums},
           MIN(ratio) AS ratio,
           CASE WHEN SUM(b_amount) = 0 THEN 0.0
                ELSE SUM(profit_amount) / SUM(b_amount) END AS rtp
    FROM {prev} GROUP BY 1, 2, 3, 4, 5, 6
  )
)"""


_ROUND = ",\n       ".join(f"ROUND({m}, 6) + 0.0 AS {m}" for m in SUM_MEASURES)
_COMMON = f"""b_count, {_ROUND},
       ROUND(ratio, 6) + 0.0 AS ratio, ROUND(rtp, 6) + 0.0 AS rtp, is_risky"""
_DATE_KEY = "CAST(year({c}) * 10000 + month({c}) * 100 + day({c}) AS INT)"

_TIER_TIME = {
    "5min": f"{_DATE_KEY.format(c='start_time')} AS summary_date,\n"
    "       CAST(hour(start_time) AS INT) AS hours,\n"
    "       CAST(minute(start_time) AS INT) AS mins,\n"
    "       start_time",
    "1h": f"{_DATE_KEY.format(c='start_time')} AS summary_date,\n"
    "       CAST(hour(start_time) AS INT) AS hours,\n"
    "       start_time",
    "1d": f"{_DATE_KEY.format(c='start_time')} AS summary_date",
    "1m": "CAST(year(start_time) * 100 + month(start_time) AS INT) AS summary_month",
}


def _oracle(tier: str) -> str:
    chain = [_P5_CTES.strip()]
    prev = "p5f"
    for t, unit in (("1h", "hour"), ("1d", "day"), ("1m", "month")):
        if tier == "5min":
            break
        chain.append(_rollup_cte(f"t{t}", prev, unit).strip())
        prev = f"t{t}"
        if t == tier:
            break
    body = f"SELECT {_KEYS}, {_COMMON},\n       {_TIER_TIME[tier]}\nFROM {prev}"
    return orc.with_ctes(body, "player_profit_log", "game_sites", extra=chain)


def _tiers(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Materialized-rollup cascade with the 5min/1h tiers persisted —
    the four tier queries, new_register and risk_ctrl all read them, so
    one session computes each tier once (exactly the reference's
    'coarser tiers never rescan raw' design, in cache form)."""
    p5 = cached_df(
        spark,
        f"player5|{sf_dir}",
        lambda: player_summary_5min(
            td.player_profit_log(spark, sf_dir), td.game_sites(spark, sf_dir), LINEITEM_GTE, LINEITEM_LT
        ),
    )
    p1h = cached_df(spark, f"player1h|{sf_dir}", lambda: player_summary_1h(p5))
    p1d = player_summary_1d(p1h)
    return {"5min": p5, "1h": p1h, "1d": p1d, "1m": player_summary_1m(p1d)}


@register("player_summary_5min", _oracle("5min"), survey_ids="A1 A2 A4 J1 F6 F7 P3 P4 P6 F1")
def q_player_summary_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    return round_doubles(_tiers(spark, sf_dir)["5min"])


@register("player_summary_1h", _oracle("1h"), survey_ids="A1 A4 F6 F7 (rollup)")
def q_player_summary_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return round_doubles(_tiers(spark, sf_dir)["1h"])


@register("player_summary_1d", _oracle("1d"), survey_ids="A1 A4 F6 F7 (rollup)")
def q_player_summary_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return round_doubles(_tiers(spark, sf_dir)["1d"])


@register("player_summary_1m", _oracle("1m"), survey_ids="A1 A4 F6 F7 (rollup)")
def q_player_summary_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return round_doubles(_tiers(spark, sf_dir)["1m"])
