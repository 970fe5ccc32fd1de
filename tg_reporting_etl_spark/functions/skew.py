"""Skew tooling: heavy-hitter profiling + two-stage salted group-by.

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


def key_skew_profile(df: DataFrame, keys: list[str], top_n: int = 20) -> DataFrame:
    """Heavy-hitter skew diagnostics for a prospective shuffle key.

    Before committing a 100 TB job to ``groupBy(keys)`` / ``join(keys)``,
    the operational question is "how hot is the hottest key?" — one whale
    key pins one reducer no matter how many executors exist.  This
    returns the ``top_n`` keys by row count with

    - ``share``      fraction of ALL rows owned by the key, and
    - ``skew_ratio`` key count over the mean per-key count (1.0 = flat;
      the classic trigger for salting / AQE skew split is >> 1).

    Plan shape: ONE data-sized scan+shuffle (the per-key partial-
    aggregated count), persisted because BOTH consumers need it — the
    scalar totals reduce it to a single row that joins back via a
    broadcast nested loop, and the top-N is a TakeOrdered, never a
    global sort materialization.  Without the persist Spark plans the
    count subtree twice (no cross-branch CSE), doubling the scan; the
    cached table is key-cardinality-sized (two longs + the key per
    row), spillable, and released by the engine's one bulk valve
    (functions/persist.py).  NULL key rows are excluded (they hash to
    one reducer but are a data-quality issue, not a skew one — the
    quality gate counts them).
    """
    from tg_reporting_etl_spark.functions.persist import tracked_persist

    counts = tracked_persist(
        df.na.drop(subset=keys)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "cnt",
            (F.round(F.col("cnt") / F.col("_total"), 6) + F.lit(0.0)).alias("share"),
            # divide-first (cnt over the double mean), never cnt*n_keys:
            # the long x long product overflows (ANSI: throws) once
            # total_rows x n_keys passes 2^63 — real at corpus scale
            (
                F.round(F.col("cnt") / (F.col("_total") / F.col("_n_keys")), 6)
                + F.lit(0.0)
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("cnt"), *keys)
        .limit(top_n)
    )


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
