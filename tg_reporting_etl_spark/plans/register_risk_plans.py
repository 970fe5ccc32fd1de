"""new_register_summary_1d + risk_ctrl queries and DuckDB oracles
(SURVEY.md §2: J2, J3, J7, A5, A7, A8, F5-F8, W3).

Oracle note: the engine computes via the materialized tier cascade
(raw -> 5min -> 1h -> 1d); the oracle aggregates the raw logs directly at
the needed grain.  All involved measures are distributive sums/counts, so
the two shapes are mathematically identical and the 6-place rounding
absorbs float-ordering ulps — this *is* the cascade-consistency check of
SURVEY §5.2 in oracle form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tg_reporting_etl_spark.adapters import oracle as orc
from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.config import RISK_CTRL_1D as _RC
from tg_reporting_etl_spark.operators.new_register import new_register_summary_1d
from tg_reporting_etl_spark.operators.risk_ctrl import risk_ctrl_game_1d, risk_ctrl_player_1d
from tg_reporting_etl_spark.operators.trans_summary import (
    trans_summary_1d,
    trans_summary_1h,
    trans_summary_5min,
)
from tg_reporting_etl_spark.plans import player_plans
from tg_reporting_etl_spark.plans.catalog import LINEITEM_GTE, LINEITEM_LT, register
from tg_reporting_etl_spark.plans.util import round_doubles

# Target day for the risk reports: well inside the lineitem range so the
# 8-day lookback [D-8, D) is fully populated at every SF.
RISK_DAY = 19960615
RISK_LOOKBACK_GTE = 19960607
_D_TS = "1996-06-15 00:00:00"
_D1_TS = "1996-06-16 00:00:00"
_G_TS = "1996-06-07 00:00:00"

_DATE_KEY = "CAST(year({c}) * 10000 + month({c}) * 100 + day({c}) AS INT)"
_RKEYS = "platform, site_code, player_name, country"
_GKEYS = "platform, site_code, game_code, country"


def _GRID5(expr: str) -> str:
    """Oracle twin of ``operators.risk_ctrl._grid5``: snap the wma/wmasd
    surface to a 5-decimal grid with ``FLOOR(x*1e5 + 0.5)/1e5`` — the
    SAME IEEE multiply + add + exact floor + divide the Spark side
    runs, so identical pre-grid doubles give identical grid values on
    both engines by construction, and the half-step shift puts the
    discontinuities on half-points no sum/7 or stddev of decimal-grain
    data can reach (see ``_grid5``'s parity proof; plain FLOOR's
    grid-point boundaries WERE reachable and split the engines on an
    exactly-80028.35000 wma at sf0.1).  ``ROUND(x, 5)`` could not give
    the identical-ops property: DuckDB rounds ``x*1e5`` in floating
    point while Spark rounds the double's exact decimal expansion
    (BigDecimal HALF_UP).  The trailing ``+ 0.0`` normalizes ``-0.0``
    to ``+0.0``: Spark's FLOOR returns a long (zero sign lost),
    DuckDB's stays double."""
    return f"FLOOR(({expr}) * 100000.0 + 0.5) / 100000.0 + 0.0"


# ---------------------------------------------------------------- new_register

_NR_ORACLE = orc.with_ctes(
    f"""SELECT d.platform, d.site_code, d.game_code, d.country, d.summary_date,
       CAST(SUM(d.b_count) AS BIGINT) AS b_count,
       ROUND(SUM(d.b_amount), 6) + 0.0 AS b_amount,
       ROUND(SUM(d.w_amount), 6) + 0.0 AS w_amount,
       ROUND(SUM(d.fee_amount), 6) + 0.0 AS fee_amount,
       ROUND(SUM(d.profit_amount), 6) + 0.0 AS profit_amount,
       ROUND(SUM(d.refund_amount), 6) + 0.0 AS refund_amount,
       CAST(COUNT(d.player_name) AS BIGINT) AS reg_count
FROM day_agg d
JOIN regs r ON d.player_name = r.player_name AND d.summary_date = r.reg_date
GROUP BY 1, 2, 3, 4, 5""",
    "player_profit_log",
    "player",
    extra=[
        f"""day_agg AS (
  SELECT {_DATE_KEY.format(c='round_time')} AS summary_date,
         platform, site_code, game_code, player_name, country,
         CAST(COUNT(bet) AS BIGINT) AS b_count,
         SUM(bet) AS b_amount, SUM(win) AS w_amount, SUM(fee) AS fee_amount,
         SUM(profit) AS profit_amount, SUM(refund) AS refund_amount
  FROM player_profit_log
  WHERE is_robot = 0
    AND round_time >= TIMESTAMP '{LINEITEM_GTE}' AND round_time < TIMESTAMP '{LINEITEM_LT}'
  GROUP BY 1, 2, 3, 4, 5, 6
)""",
        f"""regs AS (
  SELECT player_name, {_DATE_KEY.format(c='reg_time')} AS reg_date
  FROM player WHERE type = 'NORMAL'
)""",
    ],
)


@register("new_register_summary_1d", _NR_ORACLE, survey_ids="J3 A8 P6 F1")
def q_new_register_summary_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    p5 = player_plans._tiers(spark, sf_dir)["5min"]
    return round_doubles(new_register_summary_1d(p5, td.player(spark, sf_dir)))


# ------------------------------------------------------------------- risk_ctrl


def _risk_player_oracle() -> str:
    cfg = _RC["default_value_player"]
    rate = "CASE country WHEN 'THB' THEN 0.05 WHEN 'VND2' THEN 1.0 WHEN 'INR' THEN 1.0 ELSE 1.0 END"
    w = _RC["risk_score_multi"]
    extra = [
        f"""cur AS (
  SELECT {_RKEYS}, SUM(bet) AS b_cur, SUM(profit) AS p_cur,
         CASE WHEN SUM(bet) = 0 THEN 0.0 ELSE SUM(profit) / SUM(bet) END AS rtp_cur
  FROM player_profit_log
  WHERE is_robot = 0 AND round_time >= TIMESTAMP '{_D_TS}' AND round_time < TIMESTAMP '{_D1_TS}'
  GROUP BY 1, 2, 3, 4
)""",
        f"""ct AS (
  SELECT {_RKEYS},
         SUM(CASE WHEN trade_type = 'OUT' THEN value ELSE 0.0 END)
           - SUM(CASE WHEN trade_type = 'IN' THEN value ELSE 0.0 END) AS net_trans_cur
  FROM player_value_log_li
  WHERE trade_status = 'SUCCESS'
    AND trade_time >= TIMESTAMP '{_D_TS}' AND trade_time < TIMESTAMP '{_D1_TS}'
  GROUP BY 1, 2, 3, 4
)""",
        f"""pw AS (
  SELECT {_RKEYS}, {_GRID5('SUM(b_amount) / 7')} AS b_wma, {_GRID5('SUM(p_amount) / 7')} AS p_wma,
         {_GRID5('stddev_pop(b_amount)')} AS b_wmasd, {_GRID5('stddev_pop(p_amount)')} AS p_wmasd
  FROM (
    SELECT {_DATE_KEY.format(c='round_time')} AS summary_date, {_RKEYS},
           SUM(bet) AS b_amount, SUM(profit) AS p_amount
    FROM player_profit_log
    WHERE is_robot = 0 AND round_time >= TIMESTAMP '{_G_TS}' AND round_time < TIMESTAMP '{_D_TS}'
    GROUP BY 1, 2, 3, 4, 5
  ) GROUP BY 1, 2, 3, 4
)""",
        f"""tw AS (
  SELECT {_RKEYS}, {_GRID5('SUM(net_trans_amount) / 7')} AS net_trans_wma,
         {_GRID5('stddev_pop(net_trans_amount)')} AS net_trans_wmasd
  FROM (
    SELECT {_DATE_KEY.format(c='trade_time')} AS summary_date, {_RKEYS},
           SUM(CASE WHEN trade_type = 'OUT' THEN value ELSE 0.0 END)
             - SUM(CASE WHEN trade_type = 'IN' THEN value ELSE 0.0 END) AS net_trans_amount
    FROM player_value_log_li
    WHERE trade_status = 'SUCCESS'
      AND trade_time >= TIMESTAMP '{_G_TS}' AND trade_time < TIMESTAMP '{_D_TS}'
    GROUP BY 1, 2, 3, 4, 5
  ) GROUP BY 1, 2, 3, 4
)""",
        f"""meta AS (
  SELECT c.platform, c.site_code, c.player_name, c.country, c.b_cur, c.p_cur, c.rtp_cur,
         COALESCE(t.net_trans_cur, 0.0) AS net_trans_cur,
         COALESCE(pw.b_wma, 0.0) AS b_wma, COALESCE(pw.p_wma, 0.0) AS p_wma,
         COALESCE(pw.b_wmasd, 0.0) AS b_wmasd, COALESCE(pw.p_wmasd, 0.0) AS p_wmasd,
         COALESCE(tw.net_trans_wma, 0.0) AS net_trans_wma,
         COALESCE(tw.net_trans_wmasd, 0.0) AS net_trans_wmasd
  FROM cur c
  LEFT JOIN ct t USING (platform, site_code, player_name, country)
  LEFT JOIN pw USING (platform, site_code, player_name, country)
  LEFT JOIN tw USING (platform, site_code, player_name, country)
)""",
        f"""fl AS (
  SELECT *,
         CASE WHEN b_wma < {cfg['def_b_wma']} THEN {cfg['def_b_wma']} * ({rate}) ELSE b_wma END AS b_wma_f,
         CASE WHEN b_wmasd < {cfg['def_b_wmasd']} THEN {cfg['def_b_wmasd']} * ({rate}) ELSE b_wmasd END AS b_wmasd_f,
         CASE WHEN p_wma < {cfg['def_b_wma']} THEN {cfg['def_p_wma']} * ({rate}) ELSE p_wma END AS p_wma_f,
         CASE WHEN p_wmasd < {cfg['def_b_wmasd']} THEN {cfg['def_p_wmasd']} * ({rate}) ELSE p_wmasd END AS p_wmasd_f,
         CASE WHEN net_trans_wma < {cfg['def_b_wma']} THEN {cfg['def_p_wma']} * ({rate}) ELSE net_trans_wma END AS nt_wma_f,
         CASE WHEN net_trans_wmasd < {cfg['def_b_wmasd']} THEN {cfg['def_p_wmasd']} * ({rate}) ELSE net_trans_wmasd END AS nt_wmasd_f
  FROM meta
)""",
        """sg AS (
  SELECT *,
    CASE WHEN b_cur >= b_wma_f
         THEN CASE WHEN b_wmasd_f = 0 THEN 0.0 ELSE abs(b_cur - b_wma_f) / b_wmasd_f END
         ELSE 0.0 END AS b_sigma,
    CASE WHEN p_cur <= 0 THEN 0.0
         WHEN p_cur >= p_wma_f
         THEN CASE WHEN p_wmasd_f = 0 THEN 0.0 ELSE abs(p_cur - p_wma_f) / p_wmasd_f END
         ELSE 0.0 END AS p_sigma,
    CASE WHEN net_trans_cur <= 0 THEN 0.0
         WHEN net_trans_cur >= nt_wma_f
         THEN CASE WHEN nt_wmasd_f = 0 THEN 0.0 ELSE abs(net_trans_cur - nt_wma_f) / nt_wmasd_f END
         ELSE 0.0 END AS trans_sigma,
    CASE WHEN net_trans_cur > 0
         THEN CASE WHEN p_cur = 0 THEN 0.0 ELSE net_trans_cur / p_cur END
         ELSE 0.0 END AS p_trans_multi
  FROM fl
)""",
    ]
    body = f"""SELECT {_RKEYS},
       ROUND(b_cur, 6) + 0.0 AS b_cur, ROUND(p_cur, 6) + 0.0 AS p_cur,
       ROUND(rtp_cur, 6) + 0.0 AS rtp_cur, ROUND(net_trans_cur, 6) + 0.0 AS net_trans_cur,
       ROUND(b_wma, 6) + 0.0 AS b_wma, ROUND(p_wma, 6) + 0.0 AS p_wma,
       ROUND(b_wmasd, 6) + 0.0 AS b_wmasd, ROUND(p_wmasd, 6) + 0.0 AS p_wmasd,
       ROUND(net_trans_wma, 6) + 0.0 AS net_trans_wma,
       ROUND(net_trans_wmasd, 6) + 0.0 AS net_trans_wmasd,
       ROUND(b_sigma, 6) + 0.0 AS b_sigma, ROUND(p_sigma, 6) + 0.0 AS p_sigma,
       ROUND(trans_sigma, 6) + 0.0 AS trans_sigma, ROUND(p_trans_multi, 6) + 0.0 AS p_trans_multi,
       ROUND(b_sigma * {w['b']} + p_sigma * {w['wl']} + trans_sigma * {w['trans']}
             + p_trans_multi * {w['p_trans_multi']}, 6) + 0.0 AS risk_score,
       CAST({RISK_DAY} AS INT) AS summary_date
FROM sg"""
    return orc.with_ctes(body, "player_profit_log", "player_value_log_li", extra=extra)


def _risk_game_oracle() -> str:
    cfg = _RC["default_value_game"]
    rate = "CASE country WHEN 'THB' THEN 0.05 WHEN 'VND2' THEN 1.0 WHEN 'INR' THEN 1.0 ELSE 1.0 END"
    w = _RC["risk_score_multi"]
    extra = [
        f"""cur AS (
  SELECT {_GKEYS}, SUM(bet) AS b_cur, SUM(profit) AS p_cur,
         CASE WHEN SUM(bet) = 0 THEN 0.0 ELSE SUM(profit) / SUM(bet) END AS rtp_cur
  FROM player_profit_log
  WHERE is_robot = 0 AND round_time >= TIMESTAMP '{_D_TS}' AND round_time < TIMESTAMP '{_D1_TS}'
  GROUP BY 1, 2, 3, 4
)""",
        f"""pw AS (
  SELECT {_GKEYS}, {_GRID5('SUM(b_amount) / 7')} AS b_wma, {_GRID5('SUM(p_amount) / 7')} AS p_wma,
         {_GRID5('stddev_pop(b_amount)')} AS b_wmasd, {_GRID5('stddev_pop(p_amount)')} AS p_wmasd
  FROM (
    SELECT {_DATE_KEY.format(c='round_time')} AS summary_date, {_GKEYS},
           SUM(bet) AS b_amount, SUM(profit) AS p_amount
    FROM player_profit_log
    WHERE is_robot = 0 AND round_time >= TIMESTAMP '{_G_TS}' AND round_time < TIMESTAMP '{_D_TS}'
    GROUP BY 1, 2, 3, 4, 5
  ) GROUP BY 1, 2, 3, 4
)""",
        """meta AS (
  SELECT c.*, COALESCE(pw.b_wma, 0.0) AS b_wma, COALESCE(pw.p_wma, 0.0) AS p_wma,
         COALESCE(pw.b_wmasd, 0.0) AS b_wmasd, COALESCE(pw.p_wmasd, 0.0) AS p_wmasd
  FROM cur c LEFT JOIN pw USING (platform, site_code, game_code, country)
)""",
        f"""fl AS (
  SELECT *,
         CASE WHEN b_wma < {cfg['def_b_wma']} THEN {cfg['def_b_wma']} * ({rate}) ELSE b_wma END AS b_wma_f,
         CASE WHEN b_wmasd < {cfg['def_b_wmasd']} THEN {cfg['def_b_wmasd']} * ({rate}) ELSE b_wmasd END AS b_wmasd_f,
         CASE WHEN p_wma < {cfg['def_b_wma']} THEN {cfg['def_p_wma']} * ({rate}) ELSE p_wma END AS p_wma_f,
         CASE WHEN p_wmasd < {cfg['def_b_wmasd']} THEN {cfg['def_p_wmasd']} * ({rate}) ELSE p_wmasd END AS p_wmasd_f
  FROM meta
)""",
        """sg AS (
  SELECT *,
    CASE WHEN b_cur >= b_wma_f
         THEN CASE WHEN b_wmasd_f = 0 THEN 0.0 ELSE abs(b_cur - b_wma_f) / b_wmasd_f END
         ELSE 0.0 END AS b_sigma,
    CASE WHEN p_cur <= 0 THEN 0.0
         WHEN p_cur >= p_wma_f
         THEN CASE WHEN p_wmasd_f = 0 THEN 0.0 ELSE abs(p_cur - p_wma_f) / p_wmasd_f END
         ELSE 0.0 END AS p_sigma
  FROM fl
)""",
    ]
    body = f"""SELECT {_GKEYS},
       ROUND(b_cur, 6) + 0.0 AS b_cur, ROUND(p_cur, 6) + 0.0 AS p_cur,
       ROUND(rtp_cur, 6) + 0.0 AS rtp_cur,
       ROUND(b_wma, 6) + 0.0 AS b_wma, ROUND(p_wma, 6) + 0.0 AS p_wma,
       ROUND(b_wmasd, 6) + 0.0 AS b_wmasd, ROUND(p_wmasd, 6) + 0.0 AS p_wmasd,
       ROUND(b_sigma, 6) + 0.0 AS b_sigma, ROUND(p_sigma, 6) + 0.0 AS p_sigma,
       ROUND(b_sigma * {w['b']} + p_sigma * {w['wl']}, 6) + 0.0 AS risk_score,
       CAST({RISK_DAY} AS INT) AS summary_date
FROM sg"""
    return orc.with_ctes(body, "player_profit_log", extra=extra)


def _trans_tiers_li(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Lineitem-axis trans tiers, session-persisted like the other tier
    caches — without this every consumer (risk_ctrl_player, rtp twins)
    re-runs the 600k-row raw scan + two aggregation levels."""
    from tg_reporting_etl_spark.plans.util import cached_df

    t1h = cached_df(
        spark,
        f"trans_li_1h|{sf_dir}",
        lambda: trans_summary_1h(
            trans_summary_5min(td.player_value_log_lineitem(spark, sf_dir), LINEITEM_GTE, LINEITEM_LT)
        ),
    )
    t1d = cached_df(spark, f"trans_li_1d|{sf_dir}", lambda: trans_summary_1d(t1h))
    return {"1h": t1h, "1d": t1d}


@register("risk_ctrl_player_1d", _risk_player_oracle(), survey_ids="A5 J2 J7 W3 F5-F8 (stddev_pop delta)")
def q_risk_ctrl_player_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = player_plans._tiers(spark, sf_dir)
    t = _trans_tiers_li(spark, sf_dir)
    return round_doubles(
        risk_ctrl_player_1d(p["1h"], p["1d"], t["1h"], t["1d"], RISK_DAY, RISK_LOOKBACK_GTE)
    )


@register("risk_ctrl_game_1d", _risk_game_oracle(), survey_ids="A5 J2 W3 F5-F8")
def q_risk_ctrl_game_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = player_plans._tiers(spark, sf_dir)
    return round_doubles(risk_ctrl_game_1d(p["1h"], p["1d"], RISK_DAY, RISK_LOOKBACK_GTE))
