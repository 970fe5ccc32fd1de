"""Scalar/aggregate building blocks shared by every report operator.

These encode the reference's semantic quirks once (SURVEY.md §4 deltas):
÷0 -> 0 (not NULL, not inf), population stddev, int yyyymmdd date keys.
All are pure Column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column) -> Column:
    """num/den with ÷0 -> 0.

    The reference divides in pandas (inf on ÷0) then maps inf/NaN to 0
    (player_summary_5min.py:106).  ``try_divide`` yields NULL on ÷0
    under EVERY session (plain ``/`` RAISES DIVIDE_BY_ZERO for
    decimal operands under Spark 4's default ANSI mode — and the
    driver runs vanilla sessions, so operators must be ANSI-robust at
    the expression level); coalescing to 0 reproduces the reference's
    observable output.
    """
    return F.coalesce(F.try_divide(num, den), F.lit(0.0))


def int_date_key(ts: Column) -> Column:
    """timestamp -> int yyyymmdd (reference: int(t.strftime('%Y%m%d')),
    trans_summary_5min.py:96)."""
    return (F.year(ts) * 10000 + F.month(ts) * 100 + F.dayofmonth(ts)).cast("int")


def int_month_key(ts: Column) -> Column:
    """timestamp -> int yyyymm (trans_summary_1m.py:91)."""
    return (F.year(ts) * 100 + F.month(ts)).cast("int")


def window_time_keys(start: Column, tier: str) -> list[Column]:
    """The tier-dependent time-key columns appended to each summary row.

    5min: summary_date, hours, mins, start_time (trans_summary_5min.py:96-99)
    1h:   summary_date, hours, start_time       (trans_summary_1h.py:90-92)
    1d:   summary_date                          (trans_summary_1d.py:91)
    1m:   summary_month                         (trans_summary_1m.py:91)
    """
    if tier == "5min":
        return [
            int_date_key(start).alias("summary_date"),
            F.hour(start).alias("hours"),
            F.minute(start).alias("mins"),
            start.alias("start_time"),
        ]
    if tier == "1h":
        return [
            int_date_key(start).alias("summary_date"),
            F.hour(start).alias("hours"),
            start.alias("start_time"),
        ]
    if tier == "1d":
        return [int_date_key(start).alias("summary_date")]
    if tier == "1m":
        return [int_month_key(start).alias("summary_month")]
    raise ValueError(f"unknown tier {tier!r}")


def wildcard_filter(df: DataFrame, **key_values: str) -> DataFrame:
    """Dynamic equality predicates with the reference's ALL-wildcard.

    The reference splices ``AND col = 'v'`` into its SQL only when the
    task value != 'ALL' (trans_summary_5min.py:56-65, pattern ×12 files).
    Declaratively: apply each filter unless the value is 'ALL'; Catalyst
    pushes the survivors down to the parquet scan.
    """
    for col, val in key_values.items():
        if val != "ALL":
            df = df.filter(F.col(col) == val)
    return df


def cond_sum(cond: Column, value: Column) -> Column:
    """SUM(IF(cond, value, 0)) (trans_summary_5min.py:73-79)."""
    return F.sum(F.when(cond, value).otherwise(F.lit(0.0)))


def cond_count(cond: Column) -> Column:
    """SUM(IF(cond, 1, 0)) as a count (trans_summary_5min.py:75-76)."""
    return F.sum(F.when(cond, 1).otherwise(0))


def clamped_sum(value: Column) -> Column:
    """SUM(IF(v >= 0, v, 0)) — negative contributions dropped
    (player_summary_5min.py:85-86)."""
    return F.sum(F.when(value >= 0, value).otherwise(F.lit(0.0)))
