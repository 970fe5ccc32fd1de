"""Skew-resilient aggregation: two-stage salted group-by.

The player grain is skewed (whales bet orders of magnitude more rows
than the median player).  AQE's skew-join splitting covers joins; for
giant *aggregations* over a hot key the classic fix is salting: stage 1
aggregates on (key, salt) spreading the hot key over N reducers, stage 2
merges the N partials.  Results are identical for any commutative
aggregate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str | None = None,
    n_salt: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum..., count) via a salted two-stage plan."""
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salt).cast("int"))
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).alias("_n"),
    )
    aggs: list[Column] = [F.sum(c).alias(c) for c in sum_cols]
    if count_col:
        aggs.append(F.sum("_n").alias(count_col))
    return stage1.groupBy(*keys).agg(*aggs)
