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
    # The k survivors are then ranked WITHOUT a window: packed into one
    # sorted array (k-bounded by the limit — boundedness proof is the
    # limit itself) and posexploded.  Same (_h, vec_id) order as a
    # row_number, but no WindowExec and so no spurious "No Partition
    # Defined" warning for every reader to re-audit.  (_h, vec_id) is a
    # unique sort key, so the struct's trailing embedding field never
    # decides an ordering.
    seeds = (
        embeddings.select("vec_id", "embedding", h.alias("_h"))
        .orderBy(F.asc("_h"), F.asc("vec_id"))
        .limit(k)
        .agg(F.sort_array(F.collect_list(F.struct("_h", "vec_id", "embedding"))).alias("_s"))
        .select(F.posexplode("_s").alias("_i", "_c"))
        .select(
            F.col("_c.vec_id").alias("vec_id"),
            F.col("_c.embedding").alias("embedding"),
            (F.col("_i") + 1).alias("rn"),
        )
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


def ivfpq_topk(
    embeddings: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    query_pred: Column,
    dim: int,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 2,
    shortlist: int = 50,
    m: int = PQ_M,
) -> DataFrame:
    """IVF-PQ with exact re-rank — the production billion-scale ANN
    stack (FAISS IVFPQ + refine) composed from the engine's own
    pieces:

    1. coarse quantizer: probe the ``nprobe`` nearest IVF cells
       (functions/similarity.py) — candidates shrink to the probed
       cells' residents, never the corpus;
    2. PQ ADC shortlist: candidates are scored from their nibble codes
       against the per-query lookup table (fixed-order subspace sums),
       keeping ``shortlist`` rows — the corpus-side data touched per
       candidate is M bytes;
    3. exact re-rank: only the shortlist's full vectors are fetched
       and cosine-ranked to the final ``k``.

    Per query the full-vector reads drop from |corpus| to
    ``shortlist``; everything else is codes and bounded broadcasts.
    """
    from pyspark.sql import Window as W

    from tg_reporting_etl_spark.functions.similarity import (
        _dist2,
        _fixed_centroids,
        cosine,
        ivf_assign,
    )

    sub = dim // m
    cents = _fixed_centroids(embeddings, n_cells)
    assigned = ivf_assign(embeddings, n_cells, cents).select("vec_id", "cell_id")
    q = embeddings.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    probe_w = W.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell_id"))
    probes = (
        q.join(F.broadcast(cents))
        .select("query_id", "cell_id", _dist2(F.col("q_emb"), F.col("c_emb")).alias("d2"))
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "cell_id")
    )
    cand = (
        probes.join(assigned, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )

    qsub = q.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("m"), _dsub(F.col("q_emb"), mi, sub).alias("qv")
                    )
                    for mi in range(m)
                ]
            )
        ).alias("s"),
    ).select("query_id", "s.m", "s.qv")
    lut = qsub.join(F.broadcast(codebook), "m").select(
        "query_id", "m", "cid", _sqdist(F.col("qv"), F.col("cvec")).alias("d")
    )
    per_m = [
        F.sum(F.when(F.col("m") == mi, F.col("d"))).alias(f"_d{mi}") for mi in range(m)
    ]
    est_expr = None
    for mi in range(m):
        c = F.col(f"_d{mi}")
        est_expr = c if est_expr is None else est_expr + c
    cand_codes = cand.join(codes, cand["neighbor_id"] == codes["vec_id"]).select(
        "query_id", "neighbor_id", "m", "code"
    )
    est = (
        cand_codes.alias("cc")
        .join(
            F.broadcast(lut.alias("lu")),
            (F.col("cc.query_id") == F.col("lu.query_id"))
            & (F.col("cc.m") == F.col("lu.m"))
            & (F.col("cc.code") == F.col("lu.cid")),
        )
        .select(F.col("cc.query_id").alias("query_id"), "neighbor_id", F.col("cc.m").alias("m"), "d")
        .groupBy("query_id", "neighbor_id")
        .agg(*per_m)
        .select("query_id", "neighbor_id", F.round(est_expr, 6).alias("est_dist"))
    )
    short_w = W.partitionBy("query_id").orderBy(F.asc("est_dist"), F.asc("neighbor_id"))
    short = (
        est.withColumn("_rn", F.row_number().over(short_w))
        .filter(F.col("_rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    rerank = (
        short.join(
            embeddings.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
        .join(q, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    rank_w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rerank.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def pq_decode(codes: DataFrame, codebook: DataFrame, m: int = PQ_M) -> DataFrame:
    """(vec_id, approx_embedding): the quantizer's reconstruction —
    each subspace's assigned centroid, concatenated in subspace order.

    Useful for debugging recall and for downstream consumers that can
    tolerate quantized vectors without a second full-vector store.
    Reconstruction error per vector is exactly the sum of the encode
    argmin distances (pinned in tests), i.e. the ADC self-distance.
    One broadcast join + one groupBy keyed on vec_id."""
    joined = codes.alias("k").join(
        F.broadcast(codebook.alias("cb")),
        (F.col("k.m") == F.col("cb.m")) & (F.col("k.code") == F.col("cb.cid")),
    )
    parts = F.array_sort(
        F.collect_list(F.struct(F.col("k.m").alias("m"), F.col("cb.cvec").alias("cvec")))
    )
    return joined.groupBy("vec_id").agg(
        F.flatten(F.transform(parts, lambda s: s["cvec"])).alias("approx_embedding")
    )
