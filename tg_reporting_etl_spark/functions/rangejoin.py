"""Bucketed range join: point-in-interval joins with NO equi key —
the second classic join Spark SQL has no efficient native operator
for (DuckDB ships IEJoin, Postgres an interval GiST; Spark compiles a
bare range predicate to BroadcastNestedLoopJoin or worse).

Plan shape: both sides map to fixed-width time buckets — a point owns
exactly one bucket, an interval explodes into the few buckets it
overlaps (bounded by ceil(len/bucket)+1) — and the range predicate
becomes an EQUI join on the bucket id plus an exact containment
filter.  Candidate cost is |points| + sum(interval spans), never
|points| x |intervals|; the bucket id is the shuffle key, so at 100 TB
this is one co-partitioned hash join.  Pick ``bucket_secs`` near the
typical interval length: much smaller multiplies the interval
explode, much larger multiplies false candidates (both only cost, not
correctness — the exact filter runs regardless).

The bucket expansion deliberately over-covers by one trailing bucket
(sequence to bucket(end) inclusive, even when ``end`` is exclusive):
false candidates are cheaper than a boundary proof, and the exact
filter removes them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, bucket_secs: int) -> Column:
    return F.floor(F.unix_timestamp(ts) / bucket_secs).cast("long")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_secs: int = 300,
) -> DataFrame:
    """Inner join of every ``points`` row onto every ``intervals`` row
    with ``start <= point.ts < end`` (half-open, the window-sink
    convention).  Output: all interval columns + all point columns.
    A point matching an interval surfaces exactly once (it lives in
    one bucket; an interval covers each bucket at most once)."""
    pts = points.withColumn("_b", _bucket(F.col(ts), bucket_secs))
    ivs = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket(F.col(start), bucket_secs), _bucket(F.col(end), bucket_secs)
            )
        ),
    )
    return (
        ivs.join(pts, "_b")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_b")
    )
