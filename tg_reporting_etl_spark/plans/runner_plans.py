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


# ---------------------------------------------------------------- rerun cascade

# Four requests covering the cascade's edge semantics
# (GetRelatedTimeSplit.py:26-84): intra-day flooring/ceiling, a month
# boundary exactly at month start (no carry), a non-aligned month cross
# (carry to the next month), and a sub-unit span (expands to zero 5min
# windows instead of erroring — the reference's empty pd.date_range).
_RERUN_REQS = [
    ("P1", "S1", "ALL", "trans_summary", "2024-01-02 00:10:00", "2024-01-02 03:20:00", 1, 1, 1, 0),
    ("P1", "S1", "ALL", "player_summary", "2024-01-31 22:00:00", "2024-02-01 00:00:00", 0, 1, 1, 1),
    ("P2", "TG", "ALL", "trans_summary", "2024-03-30 23:30:00", "2024-04-01 01:30:00", 0, 0, 1, 1),
    ("P2", "TG", "ALL", "trans_summary", "2024-01-05 10:01:00", "2024-01-05 10:03:00", 1, 1, 0, 0),
]


def _rerun_oracle() -> str:
    vals = ",\n  ".join(
        f"('{p}', '{s}', '{g}', '{rc}', TIMESTAMP '{gte}', TIMESTAMP '{lt}', {f5}, {f1h}, {f1d}, {f1m})"
        for p, s, g, rc, gte, lt, f5, f1h, f1d, f1m in _RERUN_REQS
    )
    fixed = []
    for flag, unit, suffix, freq, level in (
        ('"5min"', "INTERVAL 5 MINUTE", "_5min", "5min", 100),
        ('"1h"', "INTERVAL 1 HOUR", "_1h", "1H", 200),
        ('"1d"', "INTERVAL 1 DAY", "_1d", "1D", 300),
    ):
        trunc = {"_5min": None, "_1h": "hour", "_1d": "day"}[suffix]
        if trunc is None:
            # 5min keeps RAW bounds — the reference does not floor them
            g, l = "r.gte_time", "r.lt_time"
        else:
            g = f"date_trunc('{trunc}', r.gte_time)"
            l = (
                f"CASE WHEN date_trunc('{trunc}', r.lt_time) = r.lt_time THEN r.lt_time "
                f"ELSE date_trunc('{trunc}', r.lt_time) + {unit} END"
            )
        fixed.append(
            f"""SELECT t AS gte_time, t + {unit} AS lt_time,
       platform, site_code, game_code, report_class,
       report_class || '{suffix}' AS assignee, '{freq}' AS freq_type, {level} AS level
FROM (
  SELECT unnest(generate_series({g}, ({l}) - {unit}, {unit})) AS t,
         r.platform, r.site_code, r.game_code, r.report_class
  FROM reqs r
  WHERE r.{flag} = 1 AND ({l}) >= ({g}) + {unit}
)"""
        )
    months = """SELECT t AS gte_time, t + INTERVAL 1 MONTH AS lt_time,
       platform, site_code, game_code, report_class,
       report_class || '_1m' AS assignee, '1M' AS freq_type, 400 AS level
FROM (
  SELECT unnest(generate_series(b.g, date_trunc('month', b.l - INTERVAL 1 DAY), INTERVAL 1 MONTH)) AS t,
         b.g, b.l, b.platform, b.site_code, b.game_code, b.report_class
  FROM (
    SELECT date_trunc('month', r.gte_time) AS g,
           CASE WHEN date_trunc('month', r.lt_time) = r.lt_time
                THEN date_trunc('month', r.lt_time)
                ELSE date_trunc('month', r.lt_time) + INTERVAL 1 MONTH END AS l,
           r.platform, r.site_code, r.game_code, r.report_class
    FROM reqs r WHERE r."1m" = 1
  ) b
  WHERE date_trunc('month', b.l - INTERVAL 1 DAY) >= date_trunc('month', b.g)
)
WHERE CAST(last_day(t) AS TIMESTAMP) >= g
  AND CAST(last_day(t) AS TIMESTAMP) <= l - INTERVAL 1 DAY"""
    body = "\nUNION ALL\n".join(fixed + [months])
    return f"WITH reqs AS (\n  SELECT * FROM (VALUES\n  {vals}\n) AS v(platform, site_code, game_code, report_class, gte_time, lt_time, \"5min\", \"1h\", \"1d\", \"1m\"))\n{body}"


@register("rerun_cascade_expansion", _rerun_oracle(), survey_ids="G3 F2 F10 U1 P9")
def q_rerun_cascade_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tg_reporting_etl_spark.runner.board import rerun_cascade

    reqs = spark.createDataFrame(
        [
            (p, s, g, rc, gte, lt, f5, f1h, f1d, f1m)
            for p, s, g, rc, gte, lt, f5, f1h, f1d, f1m in _RERUN_REQS
        ],
        "platform string, site_code string, game_code string, report_class string, "
        "gte_time string, lt_time string, `5min` int, `1h` int, `1d` int, `1m` int",
    )
    reqs = reqs.withColumn("gte_time", reqs.gte_time.cast("timestamp")).withColumn(
        "lt_time", reqs.lt_time.cast("timestamp")
    )
    return rerun_cascade(reqs)
