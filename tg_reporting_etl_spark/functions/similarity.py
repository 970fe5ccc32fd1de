"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k is the correctness baseline; the sign-LSH
variant is the scale path (bucketed candidate generation — the join key
is a band of sign bits, so the pair space shrinks from n² to
sum-of-bucket²).  All math is double-precision after an explicit cast,
summation is the sequential fold of F.aggregate so the oracle can
reproduce it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float vectors (double math)."""
    ad, bd = _dvec(a), _dvec(b)
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


def brute_force_topk(embeddings: DataFrame, query_pred: Column, k: int = 5) -> DataFrame:
    """Exact top-k neighbors for every query vector.

    The query side is broadcast (it is small by construction) so the
    corpus scan stays shuffle-free — at 100 TB this is one pass over the
    embedding table per query batch.
    Ranking key: (cosine rounded to 6, neighbor id) — deterministic under
    float ulps.
    """
    from pyspark.sql import Window as W

    q = embeddings.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = embeddings.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def sign_lsh_bands(embeddings: DataFrame, bands: int = 4, dims_per_band: int = 4) -> DataFrame:
    """(vec_id, band, band_key) from sign bits of the leading dimensions.

    Random-hyperplane LSH degenerates to coordinate hyperplanes here —
    deterministic and engine-portable; a production variant swaps in
    seeded gaussian hyperplanes, same shape.
    """
    frames = []
    for b in range(bands):
        bits = [
            F.when(F.element_at("embedding", b * dims_per_band + i + 1) >= 0, "1").otherwise("0")
            for i in range(dims_per_band)
        ]
        frames.append(
            embeddings.select("vec_id", F.lit(b).alias("band"), F.concat(*bits).alias("band_key"))
        )
    return reduce(DataFrame.unionByName, frames)


def ann_sign_lsh_topk(embeddings: DataFrame, query_pred: Column, k: int = 3) -> DataFrame:
    """Approximate top-k: candidates share >= 1 sign-LSH band with the
    query; exact cosine re-rank within candidates."""
    from pyspark.sql import Window as W

    banded = sign_lsh_bands(embeddings)
    q = embeddings.filter(query_pred).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    qb = banded.join(q, banded.vec_id == q.query_id).select("query_id", "q_emb", "band", "band_key")
    cands = (
        banded.join(qb, ["band", "band_key"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_emb", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    scored = cands.join(embeddings.select(F.col("vec_id").alias("neighbor_id"), "embedding"), "neighbor_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def embedding_dup_pairs(embeddings: DataFrame, tau: float) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= tau, a < b)."""
    a = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= tau)
    )
