"""Time-slice generator query + DuckDB oracle (SURVEY §2: G1, U1, F2).

Deliberately unaligned bounds (10:15 start, 06:47 end) exercise the
edge semantics: trailing open windows excluded, month windows kept only
when their month-end falls inside [gte, lt-1day].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tg_reporting_etl_spark.plans.catalog import register
from tg_reporting_etl_spark.runner.board import LEVELS
from tg_reporting_etl_spark.runner.timeslice import expand_timeslices

G0, L0 = "2024-01-03 10:15:00", "2024-03-02 06:47:00"
_REPORT = "trans_summary"

_FREQ_SQL = {
    "5min": ("INTERVAL 5 MINUTE", "_5min"),
    "1H": ("INTERVAL 1 HOUR", "_1h"),
    "1D": ("INTERVAL 1 DAY", "_1d"),
}


def _oracle() -> str:
    parts = []
    for freq, (unit, suffix) in _FREQ_SQL.items():
        parts.append(
            f"""SELECT gs.t AS gte_time, gs.t + {unit} AS lt_time,
       'ALL' AS platform, 'ALL' AS site_code, 'ALL' AS game_code,
       '{_REPORT}' AS report_class, '{_REPORT}{suffix}' AS assignee,
       '{freq}' AS freq_type, {LEVELS[freq]} AS level
FROM generate_series(TIMESTAMP '{G0}', TIMESTAMP '{L0}' - {unit}, {unit}) gs(t)"""
        )
    parts.append(
        f"""SELECT gs.t AS gte_time, gs.t + INTERVAL 1 MONTH AS lt_time,
       'ALL' AS platform, 'ALL' AS site_code, 'ALL' AS game_code,
       '{_REPORT}' AS report_class, '{_REPORT}_1m' AS assignee,
       '1M' AS freq_type, {LEVELS["1M"]} AS level
FROM generate_series(date_trunc('month', TIMESTAMP '{G0}'),
                     date_trunc('month', TIMESTAMP '{L0}' - INTERVAL 1 DAY),
                     INTERVAL 1 MONTH) gs(t)
WHERE CAST(last_day(gs.t) AS TIMESTAMP) >= TIMESTAMP '{G0}'
  AND CAST(last_day(gs.t) AS TIMESTAMP) <= TIMESTAMP '{L0}' - INTERVAL 1 DAY"""
    )
    return "\nUNION ALL\n".join(parts)


@register("timeslice_generator", _oracle(), survey_ids="G1 U1 F2 O1")
def q_timeslice_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = spark.createDataFrame(
        [
            (G0, L0, "ALL", "ALL", "ALL", _REPORT, f"{_REPORT}{sfx}", freq, LEVELS[freq])
            for freq, sfx in (("5min", "_5min"), ("1H", "_1h"), ("1D", "_1d"), ("1M", "_1m"))
        ],
        "gte_time string, lt_time string, platform string, site_code string, "
        "game_code string, report_class string, assignee string, freq_type string, level int",
    )
    meta = meta.withColumn("gte_time", meta.gte_time.cast("timestamp")).withColumn(
        "lt_time", meta.lt_time.cast("timestamp")
    )
    return expand_timeslices(meta)
