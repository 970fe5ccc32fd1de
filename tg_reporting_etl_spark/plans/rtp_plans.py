"""risk_ctrl_rtp_1d stateful scenario + full SQL oracle (SURVEY §2: J4 J5
A9 F4 F7 ST2 ST5).

The driver contract runs batch queries, so the stateful operator is
exposed as a deterministic 3-run update-mode scenario over the risk day:

  run1: partial-day source (rows with jp_value >= 0), clock T1 — first
        run initializes state, no throttle/cap;
  run2: full-day source, clock T2 — alerts fire, counters increment;
  run3: same source, clock T3 = T2 + 30 s — inside the 1-minute window,
        alerts are throttled.

Every input and clock is fixed, so the final snapshot is pure SQL — the
oracle replays the same three merges as CTEs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from tg_reporting_etl_spark.adapters import oracle as orc
from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.config import RISK_CTRL_1D as _RC
from tg_reporting_etl_spark.operators.player_summary import player_summary_1h, player_summary_5min
from tg_reporting_etl_spark.operators.risk_ctrl_rtp import run_rtp_scenario
from tg_reporting_etl_spark.plans.catalog import register
from tg_reporting_etl_spark.plans.register_risk_plans import RISK_DAY, _D1_TS, _D_TS
from tg_reporting_etl_spark.plans.util import round_doubles

T1 = dt.datetime(1996, 6, 15, 10, 0, 0)
T2 = dt.datetime(1996, 6, 15, 10, 0, 30)
T3 = dt.datetime(1996, 6, 15, 10, 1, 0)

_KEYS = "platform, site_code, player_name, game_code, country"
_CFG = _RC["rtp"]


def _meta_cte(name: str, extra_pred: str) -> str:
    """1h-grain rows -> day meta with risky/send flags
    (risk_ctrl_rtp_1d.py:63-120), straight from the raw log."""
    risky = (
        f"CASE WHEN (p_cur >= {_CFG['profit_threshold']} AND b_count >= {_CFG['bet_count_threshold']} "
        f"AND rtp_cur >= {_CFG['rtp_threshold']}) OR p_cur >= {_CFG['profit_unconditional']} "
        f"THEN 1 ELSE 0 END"
    )
    return f"""{name} AS (
  SELECT *, CAST({risky} AS INT) AS is_risky, CAST({risky} AS INT) AS send_alert
  FROM (
    SELECT {_KEYS}, CAST(COUNT(b_amount) AS BIGINT) AS b_count,
           SUM(b_amount) AS b_cur, SUM(profit_amount) AS p_cur,
           CASE WHEN SUM(b_amount) = 0 THEN 0.0 ELSE SUM(profit_amount) / SUM(b_amount) END AS rtp_cur,
           CAST({RISK_DAY} AS INT) AS summary_date
    FROM (
      SELECT date_trunc('hour', round_time) AS h, {_KEYS},
             SUM(bet) AS b_amount, SUM(profit) AS profit_amount
      FROM player_profit_log
      WHERE is_robot = 0
        AND round_time >= TIMESTAMP '{_D_TS}' AND round_time < TIMESTAMP '{_D1_TS}'
        {extra_pred}
      GROUP BY 1, 2, 3, 4, 5, 6
    ) GROUP BY 1, 2, 3, 4, 5
  )
)"""


def _merge_cte(out: str, old: str, new: str, t: dt.datetime) -> str:
    ts = t.strftime("%Y-%m-%d %H:%M:%S")
    return f"""{out} AS (
  SELECT summary_date, {_KEYS}, b_count, b_cur, p_cur, rtp_cur, is_risky,
         sa_f AS send_alert,
         CAST(alert_count + CASE WHEN sa_f = 1 THEN 1 ELSE 0 END AS BIGINT) AS alert_count,
         CASE WHEN sa_f = 1 THEN TIMESTAMP '{ts}' ELSE last_alert_time END AS last_alert_time,
         TIMESTAMP '{ts}' AS update_time, create_time
  FROM (
    SELECT *, CASE WHEN sa_t = 1 AND alert_count >= {_CFG['alert_limit']} THEN 0 ELSE sa_t END AS sa_f
    FROM (
      SELECT *,
             CASE WHEN (epoch(TIMESTAMP '{ts}') - epoch(last_alert_time)) / 60.0
                       < {_CFG['time_to_alert_minutes']} THEN 0 ELSE send_alert END AS sa_t
      FROM (
        SELECT o.summary_date, o.platform, o.site_code, o.player_name, o.game_code, o.country,
               n.b_count, n.b_cur, n.p_cur, n.rtp_cur, n.is_risky,
               CASE WHEN n.is_risky = 0 THEN 0 ELSE n.send_alert END AS send_alert,
               CAST(CASE WHEN n.is_risky = 0 THEN 0 ELSE o.alert_count END AS BIGINT) AS alert_count,
               CASE WHEN n.is_risky = 0 THEN TIMESTAMP '1970-01-01 00:00:00'
                    ELSE o.last_alert_time END AS last_alert_time,
               o.create_time
        FROM {old} o
        LEFT JOIN {new} n USING (platform, site_code, player_name, game_code, country)
        UNION ALL
        SELECT n.summary_date, n.platform, n.site_code, n.player_name, n.game_code, n.country,
               n.b_count, n.b_cur, n.p_cur, n.rtp_cur, n.is_risky, n.send_alert,
               CAST(0 AS BIGINT) AS alert_count,
               TIMESTAMP '1970-01-01 00:00:00' AS last_alert_time,
               TIMESTAMP '{ts}' AS create_time
        FROM {new} n
        WHERE NOT EXISTS (
          SELECT 1 FROM {old} o
          WHERE o.platform = n.platform AND o.site_code = n.site_code
            AND o.player_name = n.player_name AND o.game_code = n.game_code
            AND o.country = n.country)
      )
    )
  )
)"""


def _oracle() -> str:
    t1 = T1.strftime("%Y-%m-%d %H:%M:%S")
    extra = [
        _meta_cte("r1", "AND jp_value >= 0"),
        _meta_cte("r2", ""),
        f"""s1 AS (
  SELECT summary_date, {_KEYS}, b_count, b_cur, p_cur, rtp_cur, is_risky, send_alert,
         CAST(0 AS BIGINT) AS alert_count,
         TIMESTAMP '1970-01-01 00:00:00' AS last_alert_time,
         TIMESTAMP '{t1}' AS update_time, TIMESTAMP '{t1}' AS create_time
  FROM r1
)""",
        _merge_cte("s2", "s1", "r2", T2),
        _merge_cte("s3", "s2", "r2", T3),
    ]
    body = f"""SELECT summary_date, {_KEYS}, b_count,
       ROUND(b_cur, 6) + 0.0 AS b_cur, ROUND(p_cur, 6) + 0.0 AS p_cur,
       ROUND(rtp_cur, 6) + 0.0 AS rtp_cur,
       is_risky, send_alert, alert_count, last_alert_time, update_time, create_time
FROM s3"""
    return orc.with_ctes(body, "player_profit_log", extra=extra)


@register("risk_ctrl_rtp_1d", _oracle(), survey_ids="J4 J5 A9 F4 F7 ST2 ST5")
def q_risk_ctrl_rtp_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from tg_reporting_etl_spark.plans.player_plans import _tiers

    ppl = td.player_profit_log(spark, sf_dir)
    sites = td.game_sites(spark, sf_dir)

    def tier_1h(src: DataFrame) -> DataFrame:
        return player_summary_1h(player_summary_5min(src, sites, _D_TS, _D1_TS))

    # The full-day tier comes from the session-shared persisted 5min
    # tier: the risk day is 5-min aligned, so a post-agg summary_date
    # filter selects exactly the rows the bespoke [D, D+1) window would
    # produce — one shared aggregation pass instead of a second raw
    # scan.  Built ONCE and passed for runs 2 and 3 (run_rtp_scenario
    # aggregates repeated source objects a single time).  The partial
    # run-1 batch filters raw rows (jp_value), so it can't come from
    # the tier.
    p5 = _tiers(spark, sf_dir)["5min"]
    full = player_summary_1h(p5.filter(F.col("summary_date") == RISK_DAY))
    batches = [tier_1h(ppl.filter(ppl.jp_value >= 0)), full, full]
    final = run_rtp_scenario(batches, RISK_DAY, [T1, T2, T3])
    return round_doubles(final)
