"""Product quantization for embedding columns: M-subspace codebooks,
per-vector code words, and asymmetric-distance (ADC) top-k search.

Why PQ at 100 TB: a 64-dim float vector is 256 bytes; its PQ code is
M bytes (here 4).  The corpus-side state an ANN sweep must touch drops
by ~64x, and distance evaluation becomes a lookup-table sum — the
standard billion-scale ANN memory layout (Jégou et al., "Product
Quantization for Nearest Neighbor Search"; FAISS's IVF-PQ pairs it
with the IVF cells already in functions/similarity.py).

Determinism contract (everything oracle-checkable):
- codebooks seed from the K hash-minimal vec_ids (md5 rank) — no
  iterative k-means, no RNG.  A production pipeline would refine these
  seeds with Lloyd rounds; the OPERATOR SHAPE (codebook table, encode
  join, ADC lookup) is identical, only the centroid values change.
- all float math is the sequential left fold both engines share
  (0-seeded == first-element-seeded for these terms), so distances are
  bit-identical; rankings order by (round(dist, 6), id).
- the ADC estimate adds its M per-subspace terms in FIXED subspace
  order (conditional sums, not SUM over rows), so float addition order
  cannot differ between engines or partitionings.

Plan shapes: the codebook (M*K rows) and the per-query lookup table
(queries * M * K rows) broadcast; the corpus side is touched once to
encode and once per search to join codes against the lookup table.
The only row-scale shuffles are the encode argmin (keyed vec_id, m)
and the per-query aggregation (keyed query_id, vec_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions.dedup import h32

PQ_M = 4  # subspaces
PQ_K = 16  # centroids per subspace (one nibble per code)


def _dsub(col: Column, m: int, sub_dim: int) -> Column:
    """m-th subvector (double elements)."""
    return F.transform(
        F.slice(col, m * sub_dim + 1, sub_dim), lambda x: x.cast("double")
    )


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebook(
    embeddings: DataFrame, dim: int, m: int = PQ_M, k: int = PQ_K
) -> DataFrame:
    """(m, cid, cvec): subvectors of the ``k`` hash-minimal vectors.
    Bounded at m*k rows — always broadcastable."""
    sub = dim // m
    h = h32(F.concat(F.lit("pq|"), F.col("vec_id").cast("string")))
    # orderBy+limit compiles to TakeOrdered (per-partition top-k then a
    # k-row merge on the driver) — NOT a global single-partition window,
    # which would shuffle the whole embedding table through one task.
    # The rank window below then runs over k rows only.
    seeds = (
        embeddings.select("vec_id", "embedding", h.alias("_h"))
        .orderBy(F.asc("_h"), F.asc("vec_id"))
        .limit(k)
        .withColumn(
            "rn", F.row_number().over(Window.orderBy(F.asc("_h"), F.asc("vec_id")))
        )
        .drop("_h")
    )
    return seeds.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("m"),
                        (F.col("rn") - 1).cast("int").alias("cid"),
                        _dsub(F.col("embedding"), mi, sub).alias("cvec"),
                    )
                    for mi in range(m)
                ]
            )
        ).alias("c")
    ).select("c.m", "c.cid", "c.cvec")


def pq_encode(
    embeddings: DataFrame, codebook: DataFrame, dim: int, m: int = PQ_M
) -> DataFrame:
    """(vec_id, m, code): nearest-centroid assignment per subspace,
    argmin ordered by (round(sqdist, 6), cid).  The codebook joins as
    a broadcast on m; the argmin is a per-(vec, m) row_number."""
    sub = dim // m
    subs = embeddings.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("m"), _dsub(F.col("embedding"), mi, sub).alias("v")
                    )
                    for mi in range(m)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.m", "s.v")
    scored = subs.join(F.broadcast(codebook), "m").select(
        "vec_id", "m", "cid", F.round(_sqdist(F.col("v"), F.col("cvec")), 6).alias("d")
    )
    w = Window.partitionBy("vec_id", "m").orderBy(F.asc("d"), F.asc("cid"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "m", F.col("cid").alias("code"))
    )


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = PQ_M,
) -> DataFrame:
    """(query_id, neighbor_id, est_dist, rank): asymmetric-distance
    top-k — the query stays un-quantized, the corpus is codes only.

    Per query the M*K lookup table of exact subspace distances is
    precomputed and broadcast; corpus codes then join it by (m, code)
    and the estimate is the FIXED-ORDER sum of the M looked-up terms.
    ``queries`` must have (query_id, embedding)."""
    sub = dim // m
    qsub = queries.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("m"), _dsub(F.col("embedding"), mi, sub).alias("qv")
                    )
                    for mi in range(m)
                ]
            )
        ).alias("s"),
    ).select("query_id", "s.m", "s.qv")
    lut = qsub.join(F.broadcast(codebook), "m").select(
        "query_id", "m", "cid", _sqdist(F.col("qv"), F.col("cvec")).alias("d")
    )
    # fixed subspace order: one conditional sum per m, added m0..m{M-1}
    per_m = [
        F.sum(F.when(F.col("m") == mi, F.col("d"))).alias(f"_d{mi}") for mi in range(m)
    ]
    est_expr = None
    for mi in range(m):
        c = F.col(f"_d{mi}")
        est_expr = c if est_expr is None else est_expr + c
    est = (
        codes.join(
            F.broadcast(lut), (codes["m"] == lut["m"]) & (codes["code"] == lut["cid"])
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            codes["m"].alias("m"),
            "d",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(*per_m)
        .select("query_id", "neighbor_id", F.round(est_expr, 6).alias("est_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("est_dist"), F.asc("neighbor_id"))
    return (
        est.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "est_dist", F.col("rank").cast("int").alias("rank"))
    )
