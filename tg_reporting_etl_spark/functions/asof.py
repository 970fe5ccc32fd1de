"""AS-OF (backward temporal) join — the point-in-time lookup Spark SQL
lacks as a native operator (kdb `aj`, DuckDB/QuestDB `ASOF JOIN`,
Flink temporal join): each left row picks the LATEST right row with
the same key whose timestamp is <= its own.

Spark-first plan — the union+window trick, NOT a join:

    union(left tagged 1, right tagged 0)
      -> window per key ordered by (ts, tag): last right payload seen
      -> keep left rows

One shuffle on the key, one sort per partition, zero join explosion.
A naive implementation (equi-join on key + ts inequality + argmax)
shuffles |L| x |R per key| intermediate rows; a theta join is worse.
The union form ships each input row exactly once — the shape that
survives a 100 TB event stream, and the same sort the sessionizer
already pays.  Skewed keys: the window is per-key sequential by
nature; a production deployment with one pathological key range-splits
it by time and stitches the boundary (same structure as the sharded
prefix sum in functions/packing.py).

Right-side contract: at most one row per (key, ts) — pre-dedup with a
deterministic tie-break (the catalog query keeps max event_id), else
"the" most recent row is ambiguous.  Ties left.ts == right.ts match
(inclusive <=): the right row sorts before the left at equal ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    tolerance_seconds: int | None = None,
    right_prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join, ``direction`` 'backward' (latest right at or
    BEFORE each left row — the default, pandas ``merge_asof`` parity)
    or 'forward' (earliest right at or AFTER it — the same walk over
    the reversed sort order, so the plan shape is identical).

    Output: every ``left`` row with every non-key ``right`` column
    appended as ``{right_prefix}{col}`` (NULL when no right row on the
    required side of the left timestamp — or none within
    ``tolerance_seconds``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    r_payload = [c for c in right.columns if c not in (key, ts)]
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join("`%s`:%s" % (c, right.schema[c].dataType.simpleString()) for c in [ts] + r_payload) + ">"
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType.simpleString()).alias("_l"),
        F.struct(F.col(ts), *[F.col(c) for c in r_payload]).alias("_r"),
    )
    # ties (left.ts == right.ts) match inclusively in both directions:
    # the right row sorts before the left at equal ts.
    ts_order = F.asc("_ts") if direction == "backward" else F.desc("_ts")
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, F.asc("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if tolerance_seconds is not None:
        gap = F.unix_timestamp(F.col("_ts")) - F.unix_timestamp(F.col(f"_m.{ts}"))
        if direction == "forward":
            gap = -gap
        within = F.col("_m").isNotNull() & (gap <= tolerance_seconds)
        matched = matched.withColumn("_m", F.when(within, F.col("_m")))
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_m.{ts}").alias(f"{right_prefix}{ts}"))
    out_cols += [F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in r_payload]
    return matched.select(*out_cols)
