"""Driver-side orchestration — the reference's task_board as a library.

The reference runs a DB-as-queue (task_board/rerun_board polled by
executors, task-executor/utils/ExecUtils.py:11-31) with a producer that
mints time-window tasks (task-producer/*).  In the Spark engine the board
is a plain DataFrame and the "queue" is the job runner; these functions
are the set-oriented equivalents of each producer step.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tg_reporting_etl_spark.runner.timeslice import PASSTHROUGH, expand_timeslices

# tier levels (rerun_producer/GetRelatedTimeSplit.py:36-62)
LEVELS = {"5min": 100, "1H": 200, "1D": 300, "1M": 400}
# expected done-children per parent window (task_producer/GetTaskDepCount.py:43-50,84-90)
DEP_FREQ = {"1H": "5min", "1D": "1H", "1M": "1D"}


def has_rows(df: DataFrame) -> bool:
    """O2: LIMIT-1 existence probe (leaderboard :78-88 upsert check)."""
    return not df.limit(1).isEmpty()


def init_date_structure(spark, date_str: str) -> DataFrame:
    """G4: initial (freq, gte, lt) seed rows for one init date
    (initialize/init_main.py:8-42).  5min/1H/1D start at the date; 1M
    covers the *previous* month so the first monthly run has data."""
    import datetime as dt

    d = dt.datetime.fromisoformat(date_str)
    curr_month = d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    last_month = (curr_month - dt.timedelta(days=1)).replace(day=1)
    rows = [
        ("5min", d, d + dt.timedelta(minutes=5)),
        ("1H", d, d + dt.timedelta(hours=1)),
        ("1D", d, d + dt.timedelta(days=1)),
        ("1M", last_month, curr_month),
    ]
    return spark.createDataFrame(rows, "freq_type string, gte_time timestamp, lt_time timestamp")


def init_task_list(reports: DataFrame, date_structure: DataFrame, platform_info: dict[str, str]) -> DataFrame:
    """G4/J8: report config enriched with the seed windows
    (init_main.py:47-68).  ``reports`` columns: report_class, assignee,
    freq_type, level."""
    out = reports.join(F.broadcast(date_structure), "freq_type", "left")
    for col in ("platform", "site_code", "game_code"):
        out = out.withColumn(col, F.lit(platform_info[col]))
    return out.withColumn("done", F.lit(0))


def monthly_dep_backfill(init_tasks: DataFrame) -> DataFrame:
    """J6: self-join on report_class pairing 1D rows with their 1M row,
    minting already-done 1D tasks over [1M start, 1D start) so the first
    monthly dependency check can pass (init_main.py:70-95)."""
    m = init_tasks.filter(F.col("freq_type") == "1M").select(
        "report_class", F.col("lt_time").alias("_m_lt")
    )
    d = init_tasks.filter(F.col("freq_type") == "1D")
    dep = (
        d.join(m, "report_class", "inner")
        .withColumn("lt_time", F.col("gte_time"))
        .withColumn("gte_time", F.col("_m_lt"))
        .drop("_m_lt")
        .filter(F.col("gte_time") != F.col("lt_time"))
    )
    return expand_timeslices(dep.select("gte_time", "lt_time", *PASSTHROUGH)).withColumn(
        "done", F.lit(1)
    )


def scan_task_board(task_board: DataFrame, rerun_board: DataFrame, report_class: str) -> DataFrame:
    """T2/U1/O1: union pending tasks from both boards, tag provenance,
    priority order (ExecUtils.py:11-31; Scas*Task.py:14)."""
    pending = lambda df, rerun: (
        df.filter((F.col("done") == 0) & (F.col("report_class") == report_class)).withColumn(
            "is_rerun", F.lit(rerun)
        )
    )
    return pending(task_board, 0).unionByName(pending(rerun_board, 1)).orderBy("level", "gte_time")


def mint_tasks(watermarks: DataFrame, now: str) -> DataFrame:
    """Producer step 2 (GetNewTaskList.py:42-69): last done lt_time per
    task family becomes the new gte; lt = now floored to the freq unit;
    then G1 expansion."""
    unit = (
        F.when(F.col("freq_type") == "5min", F.expr("interval 5 minutes"))
        .when(F.col("freq_type") == "1H", F.expr("interval 1 hour"))
        .otherwise(F.expr("interval 1 day"))
    )
    now_ts = F.lit(now).cast("timestamp")
    meta = (
        watermarks.withColumnRenamed("max_lt_time", "gte_time")
        .withColumn("lt_time", now_ts)
        .filter(F.col("gte_time") + unit <= now_ts)
    )
    return expand_timeslices(meta)


def rerun_cascade(requests: DataFrame) -> DataFrame:
    """G3: one manual rerun request -> tasks for each flagged granularity
    with floored/ceiled bounds and tier levels
    (GetRelatedTimeSplit.py:26-84), then G1 window expansion.

    ``requests`` columns: platform site_code game_code report_class
    gte_time lt_time + int flags `5min` `1h` `1d` `1m`.
    """

    def ceil_to(col: str, unit: str) -> F.Column:
        t = F.date_trunc(unit, F.col(col))
        step = {"hour": "interval 1 hour", "day": "interval 1 day"}[unit]
        return F.when(t == F.col(col), F.col(col)).otherwise(t + F.expr(step))

    parts = []
    base = requests
    five = (
        base.filter(F.col("5min") == 1)
        .withColumn("assignee", F.concat(F.col("report_class"), F.lit("_5min")))
        .withColumn("freq_type", F.lit("5min"))
        .withColumn("level", F.lit(LEVELS["5min"]))
    )
    parts.append(five)
    one_h = (
        base.filter(F.col("1h") == 1)
        .withColumn("assignee", F.concat(F.col("report_class"), F.lit("_1h")))
        .withColumn("freq_type", F.lit("1H"))
        .withColumn("level", F.lit(LEVELS["1H"]))
        .withColumn("gte_time", F.date_trunc("hour", F.col("gte_time")))
        .withColumn("lt_time", ceil_to("lt_time", "hour"))
    )
    parts.append(one_h)
    one_d = (
        base.filter(F.col("1d") == 1)
        .withColumn("assignee", F.concat(F.col("report_class"), F.lit("_1d")))
        .withColumn("freq_type", F.lit("1D"))
        .withColumn("level", F.lit(LEVELS["1D"]))
        .withColumn("gte_time", F.date_trunc("day", F.col("gte_time")))
        .withColumn("lt_time", ceil_to("lt_time", "day"))
    )
    parts.append(one_d)
    # 1M: gte -> its month start; lt -> its month start when exactly at a
    # month boundary, else next month start (carry, GetRelatedTimeSplit.py:63-73)
    at_boundary = F.col("lt_time") == F.date_trunc("month", F.col("lt_time"))
    one_m = (
        base.filter(F.col("1m") == 1)
        .withColumn("assignee", F.concat(F.col("report_class"), F.lit("_1m")))
        .withColumn("freq_type", F.lit("1M"))
        .withColumn("level", F.lit(LEVELS["1M"]))
        .withColumn("gte_time", F.date_trunc("month", F.col("gte_time")))
        .withColumn(
            "lt_time",
            F.when(at_boundary, F.date_trunc("month", F.col("lt_time"))).otherwise(
                F.add_months(F.date_trunc("month", F.col("lt_time")), 1).cast("timestamp")
            ),
        )
    )
    parts.append(one_m)
    split = reduce(DataFrame.unionByName, parts).drop("5min", "1h", "1d", "1m")
    # P9: degenerate ranges dropped (GetRelatedTimeSplit.py:82)
    split = split.filter(F.col("gte_time") != F.col("lt_time"))
    return expand_timeslices(split)


def dependency_check(tasks: DataFrame, done_board: DataFrame, pass_list: tuple[str, ...] = ()) -> DataFrame:
    """ST4 completeness gate (GetTaskDepCount.py:28-92): a 1H task is
    publishable when its 12 5-min children are done, 1D when 24 1H are,
    1M when days-in-month 1D are; 5min and pass-listed assignees pass
    unconditionally.  matched = 1 publishable / 0 held.

    The per-row COUNT(*) probe loop becomes one range join + group-by.
    """
    auto = tasks.filter((F.col("freq_type") == "5min") | F.col("assignee").isin(list(pass_list))).withColumn(
        "dep_count", F.lit(0).cast("long")
    ).withColumn("matched", F.lit(1))

    gated = tasks.filter((F.col("freq_type") != "5min") & ~F.col("assignee").isin(list(pass_list)))
    dep_freq = F.when(F.col("freq_type") == "1H", "5min").when(F.col("freq_type") == "1D", "1H").otherwise("1D")
    gated = gated.withColumn("_dep_freq", dep_freq)

    d = done_board.filter(F.col("done") == 1).select(
        *[F.col(c).alias(f"_d_{c}") for c in ["platform", "site_code", "game_code", "report_class", "freq_type", "gte_time", "lt_time"]]
    )
    joined = gated.join(
        d,
        (F.col("_d_platform") == F.col("platform"))
        & (F.col("_d_site_code") == F.col("site_code"))
        & (F.col("_d_game_code") == F.col("game_code"))
        & (F.col("_d_report_class") == F.col("report_class"))
        & (F.col("_d_freq_type") == F.col("_dep_freq"))
        & (F.col("_d_gte_time") >= F.col("gte_time"))
        & (F.col("_d_lt_time") <= F.col("lt_time")),
        "left",
    )
    counted = joined.groupBy("gte_time", "lt_time", *PASSTHROUGH).agg(
        F.count("_d_gte_time").alias("dep_count")
    )
    expected = (
        F.when(F.col("freq_type") == "1H", F.lit(12))
        .when(F.col("freq_type") == "1D", F.lit(24))
        .otherwise(F.dayofmonth(F.last_day(F.col("gte_time"))))
    )
    counted = counted.withColumn("matched", F.when(F.col("dep_count") == expected, 1).otherwise(0))
    return auto.select("gte_time", "lt_time", *PASSTHROUGH, "dep_count", "matched").unionByName(
        counted.select("gte_time", "lt_time", *PASSTHROUGH, "dep_count", "matched")
    )
