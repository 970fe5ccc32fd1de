"""Count-min sketch as plain DataFrame aggregation — mergeable
fixed-size frequency summaries for unbounded key streams.

The CMS answers "how often did key k appear?" with a D x W counter
table regardless of stream size: build is ONE partial-aggregable
groupBy over (row, bucket) — each executor pre-aggregates its split's
counters map-side, the shuffle carries at most D*W rows per task, and
two sketches built on disjoint data merge by cell-wise addition (the
property that makes it a distributed-friendly summary, and the twin of
the HLL merge the streaming WAU path uses for distinct counts).

Estimates: est(k) = min over rows of counter[d][h_d(k)] — always >=
the true count (collisions only ADD), within e*N/W of it with
probability 1 - (1/2)^D for the standard hash family.  Both properties
are pinned in tests/test_sketch.py.

md5-salted bucket indices (not xxhash64) keep the sketch deterministic
and engine-portable, so the DuckDB oracle reproduces every counter and
every estimate exactly — including the over-count collisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions.dedup import h32

DEFAULT_WIDTH = 1024
DEFAULT_DEPTH = 4


def _bucket(key: Column, d: int, width: int) -> Column:
    return h32(F.concat(F.lit(f"cms|{d}|"), key)) % width


def cms_build(
    df: DataFrame, key_col: str, width: int = DEFAULT_WIDTH, depth: int = DEFAULT_DEPTH
) -> DataFrame:
    """(d, idx, c): the D x W counter table for the key stream.  Output
    rows <= depth * width whatever the input size."""
    k = F.col(key_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), _bucket(k, d, width).alias("idx"))
                    for d in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy(F.col("cell.d").alias("d"), F.col("cell.idx").alias("idx")).agg(
        F.count("*").cast("long").alias("c")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two same-shape sketches (disjoint-data merge)."""
    return (
        a.unionByName(b)
        .groupBy("d", "idx")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def cms_estimate(
    keys: DataFrame,
    key_col: str,
    counters: DataFrame,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """(key_col, cms_est): min-over-rows counter lookup per key.  The
    counter table broadcasts (it is bounded by D*W); keys never
    shuffle except the final per-key min, which is keyed on the
    caller's own bounded key set."""
    k = F.col(key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), _bucket(k, d, width).alias("idx"))
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.d").alias("d"), F.col("cell.idx").alias("idx"))
    return (
        probes.join(F.broadcast(counters), ["d", "idx"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("cms_est"))
    )
