"""trans_summary tier queries + DuckDB oracles (SURVEY.md §2: A1-A3, P3-P6, F1, S1).

The oracle mirrors the engine's materialized-rollup cascade exactly
(each tier is a CTE over the tier below, unrounded until the final
projection) so that float addition happens over the same value sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tg_reporting_etl_spark.adapters import oracle as orc
from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.operators.trans_summary import (
    trans_summary_1d,
    trans_summary_1h,
    trans_summary_1m,
    trans_summary_5min,
)
from tg_reporting_etl_spark.plans.catalog import EVENTS_GTE, EVENTS_LT, register
from tg_reporting_etl_spark.plans.util import cached_df, round_doubles

_T5_CTE = f"""
t5 AS (
  SELECT platform, site_code, player_name, country,
         time_bucket(INTERVAL '5 minutes', trade_time) AS start_time,
         SUM(CASE WHEN trade_type = 'IN' THEN value ELSE 0.0 END) AS trans_in_amount,
         SUM(CASE WHEN trade_type = 'OUT' THEN value ELSE 0.0 END) AS trans_out_amount,
         CAST(SUM(CASE WHEN trade_type = 'IN' THEN 1 ELSE 0 END) AS BIGINT) AS trans_in_count,
         CAST(SUM(CASE WHEN trade_type = 'OUT' THEN 1 ELSE 0 END) AS BIGINT) AS trans_out_count,
         SUM(CASE WHEN trade_type = 'OUT' THEN before_value ELSE 0.0 END)
           - SUM(CASE WHEN trade_type = 'OUT' THEN after_value ELSE 0.0 END)
           - SUM(CASE WHEN trade_type = 'OUT' THEN value ELSE 0.0 END) AS trans_out_lost_amount
  FROM player_value_log
  WHERE trade_status = 'SUCCESS'
    AND trade_time >= TIMESTAMP '{EVENTS_GTE}' AND trade_time < TIMESTAMP '{EVENTS_LT}'
  GROUP BY 1, 2, 3, 4, 5
)"""

_KEYS = "platform, site_code, player_name, country"
# ROUND(x, 6) + 0.0: 6 places avoids decimal-tie ambiguity (all derived
# values terminate at <=5 decimals); + 0.0 collapses -0.0 to +0.0.
_ROUND_MEASURES = """ROUND(trans_in_amount, 6) + 0.0 AS trans_in_amount,
       ROUND(trans_out_amount, 6) + 0.0 AS trans_out_amount,
       trans_in_count, trans_out_count,
       ROUND(trans_out_lost_amount, 6) + 0.0 AS trans_out_lost_amount"""
_SUM_MEASURES = """SUM(trans_in_amount) AS trans_in_amount,
         SUM(trans_out_amount) AS trans_out_amount,
         CAST(SUM(trans_in_count) AS BIGINT) AS trans_in_count,
         CAST(SUM(trans_out_count) AS BIGINT) AS trans_out_count,
         SUM(trans_out_lost_amount) AS trans_out_lost_amount"""
_DATE_KEY = "CAST(year({c}) * 10000 + month({c}) * 100 + day({c}) AS INT)"


def _tiers(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    t5 = cached_df(
        spark,
        f"trans5|{sf_dir}",
        lambda: trans_summary_5min(td.player_value_log(spark, sf_dir), EVENTS_GTE, EVENTS_LT),
    )
    t1h = trans_summary_1h(t5)
    t1d = trans_summary_1d(t1h)
    return {"5min": t5, "1h": t1h, "1d": t1d, "1m": trans_summary_1m(t1d)}


@register(
    "trans_summary_5min",
    orc.with_ctes(
        f"""SELECT {_KEYS}, {_ROUND_MEASURES},
       {_DATE_KEY.format(c='start_time')} AS summary_date,
       CAST(hour(start_time) AS INT) AS hours,
       CAST(minute(start_time) AS INT) AS mins,
       start_time
FROM (WITH {_T5_CTE.strip()} SELECT * FROM t5)""",
        "player_value_log",
    ),
    survey_ids="S1 A1 A2 A3 P3 P4 P6 F1 ST1",
)
def q_trans_summary_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    return round_doubles(_tiers(spark, sf_dir)["5min"])


@register(
    "trans_summary_1h",
    orc.with_ctes(
        f"""SELECT {_KEYS}, {_ROUND_MEASURES},
       {_DATE_KEY.format(c='ws')} AS summary_date,
       CAST(hour(ws) AS INT) AS hours,
       ws AS start_time
FROM (
  WITH {_T5_CTE.strip()}
  SELECT {_KEYS}, date_trunc('hour', start_time) AS ws, {_SUM_MEASURES}
  FROM t5 GROUP BY 1, 2, 3, 4, 5
)""",
        "player_value_log",
    ),
    survey_ids="A1 S1 (rollup cascade §4)",
)
def q_trans_summary_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return round_doubles(_tiers(spark, sf_dir)["1h"])


@register(
    "trans_summary_1d",
    orc.with_ctes(
        f"""SELECT {_KEYS}, {_ROUND_MEASURES},
       {_DATE_KEY.format(c='ws')} AS summary_date
FROM (
  WITH {_T5_CTE.strip()},
  t1h AS (
    SELECT {_KEYS}, date_trunc('hour', start_time) AS start_time, {_SUM_MEASURES}
    FROM t5 GROUP BY 1, 2, 3, 4, 5
  )
  SELECT {_KEYS}, date_trunc('day', start_time) AS ws, {_SUM_MEASURES}
  FROM t1h GROUP BY 1, 2, 3, 4, 5
)""",
        "player_value_log",
    ),
    survey_ids="A1 (tier cascade)",
)
def q_trans_summary_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return round_doubles(_tiers(spark, sf_dir)["1d"])


@register(
    "trans_summary_1m",
    orc.with_ctes(
        f"""SELECT {_KEYS}, {_ROUND_MEASURES},
       CAST(year(ws) * 100 + month(ws) AS INT) AS summary_month
FROM (
  WITH {_T5_CTE.strip()},
  t1h AS (
    SELECT {_KEYS}, date_trunc('hour', start_time) AS start_time, {_SUM_MEASURES}
    FROM t5 GROUP BY 1, 2, 3, 4, 5
  ),
  t1d AS (
    SELECT {_KEYS}, date_trunc('day', start_time) AS start_time, {_SUM_MEASURES}
    FROM t1h GROUP BY 1, 2, 3, 4, 5
  )
  SELECT {_KEYS}, date_trunc('month', start_time) AS ws, {_SUM_MEASURES}
  FROM t1d GROUP BY 1, 2, 3, 4, 5
)""",
        "player_value_log",
    ),
    survey_ids="A1 F1 (tier cascade)",
)
def q_trans_summary_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return round_doubles(_tiers(spark, sf_dir)["1m"])
