"""Sequence packing: the last hop of a pre-training data pipeline —
concatenate documents in a deterministic order and chunk the token
stream into fixed-length training sequences.

The core primitive is a GLOBAL prefix sum (each doc's start offset in
the concatenated stream).  The naive Spark expression — a window over
``ORDER BY doc_id`` with no partition key — moves the whole corpus
into ONE partition (Spark even warns: "No Partition Defined for Window
operation"), which is exactly the shape that dies at 100 TB.
:func:`sharded_cumsum` is the textbook two-pass distributed scan
instead: per-shard partial sums (tiny, driver-merged), then an
intra-shard window.  The only driver-side data is one row per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sharded_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    n_shards: int = 256,
) -> DataFrame:
    """EXCLUSIVE running sum of ``value_col`` in ``order_col`` order,
    computed without a single-partition window.

    Two passes:

    1. shard = ``order_col // ceil((max+1)/n_shards)`` (contiguous
       ranges, so shard order == global order); per-shard totals are
       aggregated and collected — ``n_shards`` rows of orchestration
       metadata, constant-bounded — and turned into exclusive shard
       offsets on the driver;
    2. the offsets broadcast-join back and an intra-shard window adds
       the within-shard exclusive prefix.

    ``order_col`` must be non-negative and unique per row (doc ids);
    ties would make "exclusive" ambiguous.
    """
    hi = df.agg(F.max(order_col).alias("m")).first()["m"]
    if hi is None:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    bucket = (int(hi) // n_shards) + 1
    sharded = df.withColumn("_shard", (F.col(order_col) / bucket).cast("long"))

    totals = sorted(
        (r["_shard"], r["t"])
        for r in sharded.groupBy("_shard").agg(F.sum(value_col).alias("t")).collect()
    )
    offsets, acc = [], 0
    for shard_id, tot in totals:
        offsets.append((shard_id, acc))
        acc += int(tot)
    off_df = df.sparkSession.createDataFrame(offsets, "_shard long, _shard_off long")

    w = W.partitionBy("_shard").orderBy(order_col).rowsBetween(W.unboundedPreceding, -1)
    return (
        sharded.join(F.broadcast(off_df), "_shard")
        .withColumn(
            out_col,
            (F.col("_shard_off") + F.coalesce(F.sum(value_col).over(w), F.lit(0))).cast("long"),
        )
        .drop("_shard", "_shard_off")
    )


def pack_sequences(
    docs_tokens: DataFrame, seq_len: int = 512, n_shards: int = 256
) -> DataFrame:
    """Pack a (doc_id, n_tokens) frame into fixed-``seq_len`` training
    sequences: docs are concatenated in doc_id order; each doc fills
    [start_off, start_off + n_tokens) of the global token stream, and
    every sequence reports how many docs touch it and how many of its
    slots are filled (== ``seq_len`` everywhere except the tail block).

    Output: (seq_id, n_docs, n_tokens).  The doc -> sequence fan-out is
    a bounded explode of ``sequence(start_seq, end_seq)`` — a doc spans
    ``ceil(n_tokens / seq_len) + 1`` blocks at most — followed by one
    partial-aggregable groupBy on seq_id.  No step materializes the
    token stream itself; packing is pure offset arithmetic.
    """
    with_off = sharded_cumsum(
        docs_tokens.filter(F.col("n_tokens") > 0),
        "doc_id",
        "n_tokens",
        out_col="start_off",
        n_shards=n_shards,
    )
    end_off = F.col("start_off") + F.col("n_tokens")  # exclusive
    spans = with_off.select(
        "doc_id",
        "start_off",
        "n_tokens",
        (F.col("start_off") / seq_len).cast("long").alias("start_seq"),
        ((end_off - 1) / seq_len).cast("long").alias("end_seq"),
    )
    exploded = spans.select(
        "doc_id",
        "start_off",
        "n_tokens",
        F.explode(F.sequence("start_seq", "end_seq")).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_len
    filled = F.least(seq_start + seq_len, F.col("start_off") + F.col("n_tokens")) - F.greatest(
        seq_start, F.col("start_off")
    )
    return exploded.groupBy("seq_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(filled).cast("long").alias("n_tokens"),
    )


def assign_balanced_shards(
    docs_tokens: DataFrame, tokens_per_shard: int, n_shards: int = 256
) -> DataFrame:
    """Assign each doc a shard id so every shard carries ~``tokens_per_shard``
    tokens (contiguous in doc_id order): shard = start_offset // target.

    The output-materialization step after curation — balanced shards
    keep downstream loader workers evenly fed.  Balance bound: each
    shard's token count differs from the target by less than one doc
    (a doc is never split).  Same two-pass scan as :func:`pack_sequences`;
    adds a ``shard`` column.
    """
    with_off = sharded_cumsum(
        docs_tokens.filter(F.col("n_tokens") > 0),
        "doc_id",
        "n_tokens",
        out_col="_start_off",
        n_shards=n_shards,
    )
    return with_off.withColumn(
        "shard", (F.col("_start_off") / tokens_per_shard).cast("long")
    ).drop("_start_off")


def write_balanced_shards(
    docs: DataFrame, out_dir: str, tokens_per_shard: int, n_shards: int = 256
) -> None:
    """Write ``docs`` (needs doc_id + text) as ``shard=N`` parquet
    partitions balanced by whitespace-token count.  Readers get one
    directory per ~equal-token shard; partition pruning gives shard-
    parallel loading for free."""
    toks = docs.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    assigned = assign_balanced_shards(toks, tokens_per_shard, n_shards).select("doc_id", "shard")
    docs.join(assigned, "doc_id").write.mode("overwrite").partitionBy("shard").parquet(out_dir)


def pack_token_ids(
    docs: DataFrame, seq_len: int = 512, vocab_mod: int = 32768, n_shards: int = 256
) -> DataFrame:
    """Materialize the ACTUAL packed training sequences: every token of
    the concatenated corpus mapped to a deterministic id (md5-hash
    vocab, engine-portable) and grouped into fixed-``seq_len`` blocks
    in stream order.

    Output: (seq_id, n_tokens, token_ids) with ``token_ids`` a
    '-'-joined id string — a portable serialization both engines
    produce byte-identically (an array column would round-trip through
    numpy in the comparison harness and lose formatting parity).

    Scale shape: this is the one operator whose row count IS the token
    count — unavoidable for materialization (the stats-only twin is
    :func:`pack_sequences`).  The explode is map-side; the only wide
    ops are the shard-bounded cumsum and the final seq_id groupBy,
    whose groups are exactly ``seq_len`` rows — no skew by
    construction.  Within-block order rides a struct sort_array, not a
    window.
    """
    from tg_reporting_etl_spark.functions.dedup import h32

    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    counts = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    offs = sharded_cumsum(counts, "doc_id", "n_tokens", out_col="start_off", n_shards=n_shards)
    gpos = F.col("start_off") + F.col("pos")
    flat = toks.join(offs.select("doc_id", "start_off"), "doc_id").select(
        (gpos / seq_len).cast("long").alias("seq_id"),
        (gpos % seq_len).cast("long").alias("wpos"),
        (h32(F.concat_ws("|", F.lit("tok"), F.col("tok"))) % vocab_mod).alias("tid"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("wpos", "tid"))), lambda x: x.tid.cast("string")
    )
    return flat.groupBy("seq_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.concat_ws("-", ordered).alias("token_ids"),
    )
