"""Event-stream utility queries: JSON prop extraction, distinct users.

The reference touches JSON only config-side; a real event pipeline
parses payload columns in-engine, so the engine exposes it as a
first-class (JVM-side, no UDF) operator with an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tg_reporting_etl_spark.plans.catalog import register
from tg_reporting_etl_spark.sources.readers import load_table

_JSON_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(max(k) AS BIGINT) AS k_max,
       ROUND(avg(value), 6) + 0.0 AS avg_value
FROM (
  SELECT event_type, value,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type"""


@register("events_json_stats", _JSON_ORACLE, survey_ids="JSON payload extraction (engine extension)")
def q_events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("k_sum"),
        F.max("k").cast("long").alias("k_max"),
        (F.round(F.avg("value"), 6) + F.lit(0.0)).alias("avg_value"),
    )


_DISTINCT_ORACLE = """
SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS INT) AS summary_date,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1"""


@register("daily_distinct_users", _DISTINCT_ORACLE, survey_ids="A9 countDistinct (exact dedup aggregate)")
def q_daily_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = (F.year("ts") * 10000 + F.month("ts") * 100 + F.dayofmonth("ts")).cast("int")
    return ev.groupBy(day.alias("summary_date")).agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
    )
