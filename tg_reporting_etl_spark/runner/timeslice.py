"""G1 time-slice generator — expand (gte, lt, freq) into window tasks.

Reference: task-producer/utils/TaskUtils.py:13-102 (pd.date_range per
meta row, serial concat loop).  Spark-native: one ``sequence`` +
``explode`` over the whole meta-task frame — every row expands in
parallel, the union-accumulation loop disappears (U1).

Semantics preserved:
- 5min/1H/1D: window starts = gte, gte+u, ... while start <= lt - u
  (the trailing open window is *excluded* — "not yet time to compute",
  TaskUtils.py:44-49); lt_time = start + u.
- 1M: months whose month-END falls in [gte, lt-1day]; gte_time = month
  start, lt_time = next month start (TaskUtils.py:74-89).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT = {"5min": "interval 5 minutes", "1H": "interval 1 hour", "1D": "interval 1 day"}

PASSTHROUGH = ["platform", "site_code", "game_code", "report_class", "assignee", "freq_type", "level"]


def expand_timeslices(meta_tasks: DataFrame) -> DataFrame:
    """meta task rows (range [gte_time, lt_time), freq_type) -> one row
    per window, all freq types handled in a single declarative plan."""
    fixed = None
    for freq, unit in _UNIT.items():
        part = (
            meta_tasks.filter(F.col("freq_type") == freq)
            # a span shorter than its unit expands to zero windows (the
            # reference's pd.date_range yields an empty range); without
            # this guard F.sequence(gte, lt - unit) has start > stop
            # with a positive step and kills the whole job at runtime
            .filter(F.col("lt_time") >= F.col("gte_time") + F.expr(unit))
            .withColumn(
                "gte_time",
                F.explode(
                    F.sequence(
                        F.col("gte_time"),
                        F.col("lt_time") - F.expr(unit),
                        F.expr(unit),
                    )
                ),
            )
            .withColumn("lt_time", F.col("gte_time") + F.expr(unit))
        )
        fixed = part if fixed is None else fixed.unionByName(part)

    months = (
        meta_tasks.filter(F.col("freq_type") == "1M")
        # sub-day spans crossing a month boundary would make the month
        # sequence's start > stop (same failure mode as above)
        .filter(
            F.date_trunc("month", F.col("lt_time") - F.expr("interval 1 day"))
            >= F.date_trunc("month", F.col("gte_time"))
        )
        .withColumn("_g0", F.col("gte_time"))
        .withColumn(
            "gte_time",
            F.explode(
                F.sequence(
                    F.date_trunc("month", F.col("gte_time")),
                    F.date_trunc("month", F.col("lt_time") - F.expr("interval 1 day")),
                    F.expr("interval 1 month"),
                )
            ),
        )
        # keep months whose month-end lies inside [gte0, lt0 - 1 day] —
        # the reference's date_range(gte, lt-1d, freq='M') month-end
        # semantics; the month-start sequence overshoots at both edges
        .withColumn("_mend", F.to_timestamp(F.last_day(F.col("gte_time"))))
    )
    months = (
        months.filter(
            (F.col("_mend") >= F.col("_g0")) & (F.col("_mend") <= F.col("lt_time") - F.expr("interval 1 day"))
        )
        .withColumn("lt_time", F.col("gte_time") + F.expr("interval 1 month"))
        .drop("_mend", "_g0")
    )
    assert fixed is not None
    return fixed.unionByName(months).select("gte_time", "lt_time", *PASSTHROUGH)
