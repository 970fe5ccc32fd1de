"""Single-pass multi-grain rollup via GROUPING SETS.

The reference materializes 5min->1h->1d->1m by re-reading each tier
(SURVEY §4 'pre-aggregation cascade').  When all grains are wanted at
once, one shuffle with grouping sets produces every tier in a single
pass — the Spark-first alternative the reference couldn't express.
Exposed at (hour, day, month) grain over the wallet log with a
``grain`` discriminator column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tg_reporting_etl_spark.adapters import oracle as orc
from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.plans.catalog import EVENTS_GTE, EVENTS_LT, register

_KEYS = "platform, site_code"

_ORACLE = orc.with_ctes(
    f"""SELECT platform, site_code,
       CASE WHEN hour_start IS NOT NULL THEN 'hour'
            WHEN day_start IS NOT NULL THEN 'day'
            ELSE 'month' END AS grain,
       hour_start, day_start, month_start,
       ROUND(SUM(CASE WHEN trade_type = 'IN' THEN value ELSE 0.0 END), 6) + 0.0 AS trans_in_amount,
       ROUND(SUM(CASE WHEN trade_type = 'OUT' THEN value ELSE 0.0 END), 6) + 0.0 AS trans_out_amount,
       CAST(count(*) AS BIGINT) AS n_rows
FROM (
  SELECT platform, site_code, trade_type, value,
         date_trunc('hour', trade_time) AS hour_start,
         date_trunc('day', trade_time) AS day_start,
         date_trunc('month', trade_time) AS month_start
  FROM player_value_log
  WHERE trade_status = 'SUCCESS'
    AND trade_time >= TIMESTAMP '{EVENTS_GTE}' AND trade_time < TIMESTAMP '{EVENTS_LT}'
)
GROUP BY GROUPING SETS (
  (platform, site_code, hour_start, day_start, month_start),
  (platform, site_code, day_start, month_start),
  (platform, site_code, month_start)
)""",
    "player_value_log",
)


@register("tiered_rollup_grouping_sets", _ORACLE, survey_ids="A1 (single-pass multi-grain alternative)")
def q_tiered_rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    pvl = td.player_value_log(spark, sf_dir)
    base = pvl.filter(
        (pvl.trade_status == "SUCCESS")
        & (pvl.trade_time >= F.lit(EVENTS_GTE).cast("timestamp"))
        & (pvl.trade_time < F.lit(EVENTS_LT).cast("timestamp"))
    ).select(
        "platform",
        "site_code",
        "trade_type",
        "value",
        F.date_trunc("hour", "trade_time").alias("hour_start"),
        F.date_trunc("day", "trade_time").alias("day_start"),
        F.date_trunc("month", "trade_time").alias("month_start"),
    )
    base.createOrReplaceTempView("_rollup_base")
    return spark.sql(
        """
        SELECT platform, site_code,
               CASE WHEN hour_start IS NOT NULL THEN 'hour'
                    WHEN day_start IS NOT NULL THEN 'day'
                    ELSE 'month' END AS grain,
               hour_start, day_start, month_start,
               ROUND(SUM(CASE WHEN trade_type = 'IN' THEN value ELSE 0.0 END), 6) + 0.0 AS trans_in_amount,
               ROUND(SUM(CASE WHEN trade_type = 'OUT' THEN value ELSE 0.0 END), 6) + 0.0 AS trans_out_amount,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM _rollup_base
        GROUP BY GROUPING SETS (
          (platform, site_code, hour_start, day_start, month_start),
          (platform, site_code, day_start, month_start),
          (platform, site_code, month_start)
        )
        """
    )
