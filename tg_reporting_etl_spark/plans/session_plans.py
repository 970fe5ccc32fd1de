"""Sessionization query + DuckDB oracle (lag/cumsum window pattern)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tg_reporting_etl_spark.operators.sessions import sessionize
from tg_reporting_etl_spark.plans.catalog import register
from tg_reporting_etl_spark.sources.readers import load_table

GAP_MIN = 30

_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_type, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
ids AS (
  SELECT *, CAST(sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       ROUND(sum(value), 6) AS total_value,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
FROM ids GROUP BY 1, 2"""


@register("sessionize_events", _ORACLE, survey_ids="W-family: lag + cumsum sessionization")
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"), GAP_MIN)
