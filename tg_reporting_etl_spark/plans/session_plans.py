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


# Session funnel: ordered progression through view -> click -> purchase.
# Oracle folds the time-ordered event list with a string-state
# list_reduce (DuckDB's fold requires acc and element types to match,
# so the step counter rides as a digit string) — the exact mirror of
# the Spark aggregate() integer fold.
FUNNEL = ["view", "click", "purchase"]

_FUNNEL_CASES = "\n             ".join(
    f"WHEN acc = '{i}' AND x = '{s}' THEN '{i + 1}'" for i, s in enumerate(FUNNEL)
)

_FUNNEL_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
ids AS (
  SELECT *, sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
folded AS (
  SELECT user_id, session_id,
         CAST(list_reduce(
           list_prepend('0', list(event_type ORDER BY ts, event_type)),
           (acc, x) -> CASE
             {_FUNNEL_CASES}
             ELSE acc END) AS INT) AS funnel_step
  FROM ids GROUP BY user_id, session_id
)
SELECT funnel_step, CAST(count(*) AS BIGINT) AS n_sessions
FROM folded GROUP BY 1"""


@register(
    "session_funnel",
    _FUNNEL_ORACLE,
    survey_ids="events analytics: session funnel via in-codegen ordered fold",
)
def q_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sessions.py:funnel_steps — per-session ordered funnel
    progression as a pure array_sort + aggregate() fold (no UDF), then
    the (funnel_step, n_sessions) distribution."""
    from tg_reporting_etl_spark.operators.sessions import funnel_steps

    out = funnel_steps(load_table(spark, sf_dir, "events"), FUNNEL, GAP_MIN)
    from pyspark.sql import functions as F

    return out.select(F.col("funnel_step").cast("int").alias("funnel_step"), "n_sessions")


_RETENTION_ORACLE = """
WITH first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY 1
),
active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events
)
SELECT f.cohort_date,
       CAST(date_diff('day', f.cohort_date, a.active_date) AS INT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM active a JOIN first f USING (user_id)
GROUP BY 1, 2"""


@register(
    "retention_cohorts",
    _RETENTION_ORACLE,
    survey_ids="events analytics: daily retention triangle (cohort x day offset)",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sessions.py:retention_cohorts — first-seen cohort x
    active-day offset counts; both aggs shuffle on user_id so the join
    reuses one exchange."""
    from tg_reporting_etl_spark.operators.sessions import retention_cohorts

    return retention_cohorts(load_table(spark, sf_dir, "events"))


WAU_DAYS = 7

_WAU_ORACLE = f"""
WITH per_day AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events
),
fanned AS (
  SELECT user_id, active_date + INTERVAL (o) DAY AS report_date
  FROM per_day CROSS JOIN generate_series(0, {WAU_DAYS - 1}) s(o)
)
SELECT CAST(report_date AS DATE) AS report_date,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
FROM fanned GROUP BY 1"""


@register(
    "trailing_active_users",
    _WAU_ORACLE,
    survey_ids="events analytics: exact trailing-7-day active users (WAU)",
)
def q_trailing_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sessions.py:trailing_active_users — bounded fan-out of
    active days to their report windows, no day-range self-join."""
    from tg_reporting_etl_spark.operators.sessions import trailing_active_users

    return trailing_active_users(load_table(spark, sf_dir, "events"), WAU_DAYS)
