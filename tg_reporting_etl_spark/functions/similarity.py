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
    """Cosine similarity of two float vectors (double math).

    Degenerate-vector contract (family-wide): an all-zero vector has no
    defined direction, so its cosine is NULL (``try_divide``) and it
    can never clear a ``>= tau`` filter at ANY tau — the Arrow verify
    path (:func:`verify_cosine_pairs`) drops such pairs explicitly for
    the same outcome.  A bare ``/`` would instead throw DIVIDE_BY_ZERO
    under ANSI mode the first time a degenerate vector appears in
    production data."""
    ad, bd = _dvec(a), _dvec(b)
    return F.try_divide(_dot(ad, bd), F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


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


def embedding_dup_pairs_blocked(
    embeddings: DataFrame, tau: float, n_blocks: int = 8
) -> DataFrame:
    """Scale path for all-pairs cosine: blocked matrix product.

    Vectors are hashed into ``n_blocks`` blocks; every block pair
    (ba <= bb) becomes one applyInPandas group whose pandas function
    computes the block-vs-block similarity matrix with one numpy GEMM —
    BLAS throughput instead of per-pair interpreted folds.  Data volume
    shipped through Arrow is n_vectors x n_blocks rows (each block meets
    every other block once), independent of the pair count.

    numpy's blocked summation differs from the sequential fold by last
    ulps; results are rounded to 6 places before the tau filter, same as
    the exact operator — `test_blocked_equals_fold` pins the parity.
    """
    import pandas as pd

    tagged = embeddings.select(
        "vec_id", "embedding", (F.col("vec_id") % n_blocks).alias("_blk")
    )
    sides = []
    for side, key in (("a", "_ba"), ("b", "_bb")):
        other = F.explode(F.array(*[F.lit(i) for i in range(n_blocks)]))
        frame = tagged.select(
            "vec_id", "embedding", F.col("_blk").alias(key), other.alias("_bo"), F.lit(side).alias("_side")
        )
        # side a pairs with blocks >= its own; side b with blocks <= its own
        if side == "a":
            frame = frame.filter(F.col("_bo") >= F.col(key)).select(
                "vec_id", "embedding", F.col(key).alias("_ba"), F.col("_bo").alias("_bb"), "_side"
            )
        else:
            frame = frame.filter(F.col("_bo") <= F.col(key)).select(
                "vec_id", "embedding", F.col("_bo").alias("_ba"), F.col(key).alias("_bb"), "_side"
            )
        sides.append(frame)
    both = sides[0].unionByName(sides[1])

    def _block_cos(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        a = pdf[pdf["_side"] == "a"]
        b = pdf[pdf["_side"] == "b"]
        if a.empty or b.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
            )
        u = np.stack(a["embedding"].to_numpy()).astype("float64")
        v = np.stack(b["embedding"].to_numpy()).astype("float64")
        sims = (u / np.linalg.norm(u, axis=1, keepdims=True)) @ (
            v / np.linalg.norm(v, axis=1, keepdims=True)
        ).T
        ia = a["vec_id"].to_numpy()
        ib = b["vec_id"].to_numpy()
        ai, bi = np.meshgrid(np.arange(len(ia)), np.arange(len(ib)), indexing="ij")
        left, right = ia[ai], ib[bi]
        same_block = a["_ba"].iloc[0] == a["_bb"].iloc[0]
        # within a block both orientations appear -> keep one; across
        # blocks each unordered pair appears exactly once -> keep all,
        # normalized to (min, max)
        mask = (left < right) if same_block else (left != right)
        va = np.minimum(left[mask], right[mask])
        vb = np.maximum(left[mask], right[mask])
        sims_r = np.round(sims[mask], 6)
        keep = sims_r >= tau
        return pd.DataFrame({"vec_a": va[keep], "vec_b": vb[keep], "cos_sim": sims_r[keep]})

    return both.groupBy("_ba", "_bb").applyInPandas(
        _block_cos, "vec_a long, vec_b long, cos_sim double"
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


def _dist2(a: Column, b: Column) -> Column:
    """Squared L2 distance, sequential fold (cross-engine exact)."""
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _fixed_centroids(embeddings: DataFrame, n_cells: int) -> DataFrame:
    """Deterministic quantizer: the first ``n_cells`` vectors.

    This is the oracle-checked variant (DuckDB can reproduce it row for
    row); :func:`kmeans_centroids` is the trained production quantizer.
    """
    return embeddings.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )


def kmeans_centroids(embeddings: DataFrame, n_cells: int = 16, seed: int = 7) -> DataFrame:
    """Train the IVF quantizer with seeded k-means (pyspark.ml).

    Returns the same (cell_id, c_emb) shape as the fixed quantizer so
    :func:`ivf_assign`/:func:`ivf_topk` take either interchangeably.
    Training cost is a few corpus passes over an ml-vector projection;
    at 100 TB you train on a sample (``embeddings.sample(...)``) — the
    assignment step, not training, is the part that must scan everything.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = embeddings.select(array_to_vector(_dvec(F.col("embedding"))).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell_id int, c_emb array<double>",
    )


def ivf_assign(
    embeddings: DataFrame, n_cells: int = 16, centroids: DataFrame | None = None
) -> DataFrame:
    """IVF coarse quantization: nearest centroid per vector.

    ``centroids`` defaults to the deterministic fixed quantizer
    (:func:`_fixed_centroids`); pass :func:`kmeans_centroids` output for
    the trained index.  Assignment is one broadcast nested-loop over
    n x k rows (k tiny), argmin by (distance, centroid id).

    The argmin is ``min(struct(d2, cell_id))`` — lexicographic struct
    ordering IS (distance asc, centroid id asc), the same
    tie-deterministic rule a row_number window would give, but with
    map-side partial aggregation: only the NARROW (vec_id, d2, cell_id)
    triple crosses the n x k expansion, never the embedding payload
    (with auto-sized k ~ n/64 the payload-through-window shape shuffles
    ~k copies of the corpus; the narrow agg collapses per-vector before
    the exchange).  The embedding rejoins by vec_id afterwards — one
    n-row equi-join instead of an n x k wide shuffle.
    """
    cents = _fixed_centroids(embeddings, n_cells) if centroids is None else centroids
    # the expansion multiplies ROWS x k but inherits the input's
    # PARTITION count — a small-file corpus (the sf fixtures arrive as
    # 1-2 parquet splits) would run the k-per-row distance folds nearly
    # serially.  Fan out to the cluster width first when the source is
    # narrower than it; a corpus that already has >= cores partitions
    # (any real 100 TB table) is left untouched, so no corpus-sized
    # shuffle is ever added at scale.
    src = embeddings.select("vec_id", "embedding")
    width = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < width:
        src = src.repartition(width)
    best = (
        src.join(F.broadcast(cents))
        .select(
            "vec_id",
            F.struct(
                _dist2(F.col("embedding"), F.col("c_emb")).alias("d2"),
                F.col("cell_id").alias("cell_id"),
            ).alias("_dc"),
        )
        .groupBy("vec_id")
        .agg(F.min("_dc").alias("_m"))
        .select("vec_id", F.col("_m.cell_id").alias("cell_id"))
    )
    return embeddings.join(best, "vec_id").select("vec_id", "embedding", "cell_id")


def ivf_topk(
    embeddings: DataFrame,
    query_pred: Column,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` nearest cells, exact cosine rerank.

    At scale the assignment table is the materialized index (partitioned
    by cell_id -> a query touches nprobe partitions, not the corpus).
    ``centroids=None`` uses the fixed oracle-checked quantizer; pass
    :func:`kmeans_centroids` output for the trained variant.
    """
    from pyspark.sql import Window as W

    cents = _fixed_centroids(embeddings, n_cells) if centroids is None else centroids
    assigned = ivf_assign(embeddings, n_cells, cents)
    q = embeddings.filter(query_pred).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    probe_w = W.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell_id"))
    probes = (
        q.join(F.broadcast(cents))
        .select("query_id", "q_emb", "cell_id", _dist2(F.col("q_emb"), F.col("c_emb")).alias("d2"))
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_emb", "cell_id")
    )
    cands = (
        probes.join(assigned, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_emb", F.col("vec_id").alias("neighbor_id"), "embedding")
        .distinct()
    )
    rank_w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cands.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> float:
    """Mean per-query recall@k of an ANN result against the exact top-k.

    Both inputs are (query_id, neighbor_id, rank) frames (the shape
    every top-k operator here returns).  A query the ANN missed
    entirely counts as recall 0, not as absent — the mean is over the
    EXACT result's query set.  This is the standard ANN quality metric
    (what faiss reports as R@k); it is driver-side only in the final
    tiny per-query aggregate.
    """
    t = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    a = approx.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    hit = t.join(a, ["query_id", "neighbor_id"], "left_semi").groupBy("query_id").agg(
        F.count("*").alias("hits")
    )
    per_q = (
        t.groupBy("query_id")
        .agg(F.count("*").alias("n"))
        .join(hit, "query_id", "left")
        .select((F.coalesce(F.col("hits"), F.lit(0)) / F.col("n")).alias("r"))
    )
    return float(per_q.agg(F.avg("r")).first()[0])


def embedding_dup_pairs(embeddings: DataFrame, tau: float) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= tau, a < b).

    Squared norms are computed once per vector and joined into the pair
    frame — same IEEE values as computing them per pair (so the oracle
    math is unchanged) at a third of the higher-order-function evals,
    which are interpreted, not codegen'd.
    """
    with_norm = embeddings.select(
        "vec_id", "embedding", _dot(_dvec(F.col("embedding")), _dvec(F.col("embedding"))).alias("n2")
    )
    a = with_norm.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("n2").alias("n2a")
    )
    b = with_norm.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("n2").alias("n2b")
    )
    # try_divide: an all-zero vector's 0/0 yields NULL (never >= tau),
    # matching cosine()'s contract instead of an ANSI DIVIDE_BY_ZERO
    cos = F.try_divide(
        _dot(_dvec(F.col("ea")), _dvec(F.col("eb"))), F.sqrt("n2a") * F.sqrt("n2b")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= tau)
    )


#: scale-linear pair budget for the all-pairs gate — mirrors the n-gram
#: family's constants (dedup.py _CAND_BUDGET_*): the exact GEMM is
#: allowed while n·(n-1)/2 stays under max(n·per_vec, floor).
_PAIR_BUDGET_PER_VEC = 64
_PAIR_BUDGET_FLOOR = 1 << 21


def banded_candidate_pairs(
    embeddings: DataFrame, bands: int = 8, dims_per_band: int = 8
) -> DataFrame:
    """Sign-LSH candidate pairs (vec_a < vec_b, distinct): vectors pair
    up when ANY band of sign bits matches exactly.

    This is the bounded-candidate generator for corpus-wide embedding
    near-dup: the join key is (band, band_key), so the pair space is
    sum-of-bucket-C(cnt,2) per band, never n²/2.  With the default
    8 bands x 8 dims (all 64 dims of the test embeddings) a random
    bucket holds ~n/256 vectors — candidates ~n²/8192 per band on
    uncorrelated data, and true near-dups (cos -> 1) collide in some
    band with probability -> 1.  Deterministic coordinate hyperplanes,
    like :func:`sign_lsh_bands` (same engine-portability rationale).
    """
    banded = sign_lsh_bands(embeddings, bands, dims_per_band)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )


def verify_cosine_pairs(embeddings: DataFrame, pairs: DataFrame, tau: float) -> DataFrame:
    """Exact cosine over a BOUNDED candidate pair set, Arrow-batched.

    Each side's embedding joins in (two hash joins keyed on vec_id —
    candidate-set-sized, never corpus²), then one mapInPandas computes
    the row-wise normalized dot product with numpy — BLAS-vectorized
    like the blocked GEMM, but over exactly the candidate rows.  Results
    are rounded to 6 places before the tau filter, the family-wide
    convention; numpy-vs-sequential-fold parity at that rounding is
    pinned by test_banded_verify_equals_fold."""
    import pandas as pd

    joined = (
        pairs.join(
            embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("_ea")),
            "vec_a",
        )
        .join(
            embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("_eb")),
            "vec_b",
        )
        .select("vec_a", "vec_b", "_ea", "_eb")
    )

    def _batch_cos(batches):
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            u = np.stack(pdf["_ea"].to_numpy()).astype("float64")
            v = np.stack(pdf["_eb"].to_numpy()).astype("float64")
            nu = np.linalg.norm(u, axis=1, keepdims=True)
            nv = np.linalg.norm(v, axis=1, keepdims=True)
            # degenerate-vector contract (matches the fold path's
            # try_divide NULL at EVERY tau, including tau <= 0): a pair
            # with an all-zero side is dropped outright.  The clamp
            # below only prevents the 0/0 NaN + per-batch numpy
            # RuntimeWarning on those already-excluded rows.
            defined = ((nu > 0.0) & (nv > 0.0)).ravel()
            u /= np.maximum(nu, 1e-300)
            v /= np.maximum(nv, 1e-300)
            cos = np.round(np.einsum("ij,ij->i", u, v), 6)
            keep = (cos >= tau) & defined
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].to_numpy()[keep],
                    "vec_b": pdf["vec_b"].to_numpy()[keep],
                    "cos_sim": cos[keep],
                }
            )

    return joined.mapInPandas(_batch_cos, "vec_a long, vec_b long, cos_sim double")


def embedding_dup_pairs_gated(
    embeddings: DataFrame,
    tau: float,
    on_blowup: str = "error",
    pair_budget_per_vec: int = _PAIR_BUDGET_PER_VEC,
    budget_floor: int = _PAIR_BUDGET_FLOOR,
    bands: int = 8,
    dims_per_band: int = 8,
    n_blocks: int = 8,
    path_sink: dict | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs with a SELF-PRICING gate — the
    n-gram family's contract (dedup.py ngram_jaccard_dedup) applied to
    the one remaining all-pairs-compute surface.

    The blocked GEMM (:func:`embedding_dup_pairs_blocked`) does n²/2
    exact dot products however you block it, so it is priced FIRST:
    while n·(n-1)/2 fits the scale-linear budget
    (``max(n_vecs · pair_budget_per_vec, budget_floor)``) it runs as the
    exact small-input path.  Beyond the budget:

    - ``on_blowup="error"`` (DEFAULT) raises, naming the opt-ins — an
      operator documented as exact must not silently change its recall
      contract with scale.
    - ``on_blowup="lsh"`` (explicit opt-in) reroutes to sign-LSH band
      candidates (:func:`banded_candidate_pairs`) + exact-cosine verify
      (:func:`verify_cosine_pairs`): every REPORTED pair is exact, but
      recall is tau-dependent — for random-hyperplane LSH the per-bit
      collision probability is 1-θ/π, so recall -> 1 as cos -> 1 (true
      near-dups) and decays toward the 1-(1-2^-dims_per_band)^bands
      random-collision floor at low tau.  Near-dup recall is pinned by
      test_banded_recall_floor_on_near_dups.
    - ``on_blowup="force"`` bypasses the gate: blocked GEMM at any cost.

    The pricing pass is one count (n_vecs) — the quadratic compute is
    never started in a blow-up regime.  ``path_sink`` (a dict) receives
    the chosen path and pricing stats for tests/observability; on the
    banded path it also receives ``est`` — the band-join candidate-slot
    upper bound (sum of C(bucket, 2)), a linear aggregate that tells an
    operator whether a dup-exploded corpus has made the OUTPUT itself
    quadratic (at which point no algorithm returns it cheaply).
    """
    if on_blowup == "lsh" and pair_budget_per_vec == 0 and budget_floor == 0:
        # zeroed budget + explicit reroute consent: the gate's outcome is
        # 'lsh' for every n >= 2, so the pricing count() job is skipped
        # (on n <= 1 the banded path correctly returns no pairs anyway)
        n, npairs, budget, path = None, None, 0, "lsh"
    else:
        n = embeddings.count()
        npairs = n * (n - 1) // 2
        budget = max(n * pair_budget_per_vec, budget_floor)
        path = None
    if path is None and (on_blowup == "force" or npairs <= budget):
        path = "gemm"
    elif path is None and on_blowup == "lsh":
        path = "lsh"
    elif path is None:
        raise ValueError(
            f"embedding_dup_pairs_gated: exact all-pairs cosine is n·(n-1)/2 = "
            f"{npairs:,} dot products for {n:,} vectors (budget {budget:,}) — "
            f"all-pairs COMPUTE, however it is blocked. Pass on_blowup='lsh' for "
            f"sign-LSH band candidates + exact-cosine verify (reported pairs stay "
            f"exact; recall <1 for pairs near tau), or on_blowup='force' to run "
            f"the blocked GEMM at any cost."
        )
    if path_sink is not None:
        path_sink.update(path=path, n_vecs=n, npairs=npairs, budget=budget)
    if path == "gemm":
        return embedding_dup_pairs_blocked(embeddings, tau, n_blocks)
    if path_sink is not None:
        banded = sign_lsh_bands(embeddings, bands, dims_per_band)
        est_row = (
            banded.groupBy("band", "band_key")
            .agg(F.count("*").alias("c"))
            .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("est"))
            .first()
        )
        path_sink["est"] = int(est_row.est or 0)
    cands = banded_candidate_pairs(embeddings, bands, dims_per_band)
    return verify_cosine_pairs(embeddings, cands, tau)


def build_ivf_index(
    embeddings: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    centroids: DataFrame | None = None,
) -> None:
    """Materialize the IVF index: ``centroids`` parquet + assignments
    partitioned BY CELL (``cells/cell_id=N/``).

    This is the serving shape :func:`ivf_topk`'s docstring promises: at
    100 TB the assignment table is built once (the only full-corpus
    pass) and every later query batch reads just its probed cells via
    partition pruning — the index directory IS the ANN index, no
    serving process required.
    """
    import os

    cents = _fixed_centroids(embeddings, n_cells) if centroids is None else centroids
    cents.write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))
    ivf_assign(embeddings, n_cells, cents).write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(os.path.join(index_dir, "cells"))


def ivf_index_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """Probe a materialized IVF index (:func:`build_ivf_index`).

    ``queries`` is (vec_id, embedding) — vectors that need not be in
    the index.  The probe set (query x nprobe cells, tiny) broadcasts
    into the join against the cell-partitioned assignment table, so
    Catalyst applies DYNAMIC PARTITION PRUNING: the parquet scan reads
    only the probed ``cell_id=N`` directories, not the corpus
    (plan-asserted in tests/test_llm_layer.py).  Rerank is the exact
    cosine with the (cos_sim, neighbor_id) deterministic tie-break.
    """
    import os

    from pyspark.sql import Window as W

    cents = spark.read.parquet(os.path.join(index_dir, "centroids"))
    assigned = spark.read.parquet(os.path.join(index_dir, "cells"))
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))

    probe_w = W.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell_id"))
    probes = (
        q.join(F.broadcast(cents))
        .select("query_id", "q_emb", "cell_id", _dist2(F.col("q_emb"), F.col("c_emb")).alias("d2"))
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_emb", "cell_id")
    )
    cands = (
        assigned.join(F.broadcast(probes), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_emb", F.col("vec_id").alias("neighbor_id"), "embedding")
        .distinct()
    )
    rank_w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cands.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def semdedup(
    embeddings: DataFrame,
    tau: float,
    n_cells: int | None = None,
    centroids: DataFrame | None = None,
    pair_budget_per_vec: int = _PAIR_BUDGET_PER_VEC,
    budget_floor: int = _PAIR_BUDGET_FLOOR,
    path_sink: dict | None = None,
) -> DataFrame:
    """Cell-bounded semantic dedup (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus, then look for near-dups only
    WITHIN each cell — the pair space is sum-of-cell-C(c,2), never n²/2,
    and the operator's scale knob is ``n_cells`` (size it so cells stay
    bounded as the corpus grows; the paper runs 50k clusters on LAION).

    Semantics (deterministic, engine-portable):

    - ``n_cells=None`` (default) AUTO-SIZES the cell count to
      ``max(16, n // 64)`` — expected cell occupancy stays ~64 however
      large the corpus, so the within-cell pair space stays LINEAR in n
      (the paper's own scaling story: 50k clusters for LAION).  The
      DuckDB oracle derives the same k from ``count(*)``, so the
      auto-sized operator stays exact-checkable at every scale;
    - assignment = nearest centroid by squared L2, ties to the lower
      ``cell_id`` (:func:`ivf_assign` — the same coarse quantizer the
      IVF index uses; ``centroids=None`` is the fixed oracle-checked
      quantizer, pass :func:`kmeans_centroids` output in production);
    - within a cell, vector ``b`` is REMOVED iff some other member
      ``a`` of the same cell has ``round(cos(a, b), 6) >= tau`` and
      ``a`` is PREFERRED — lower centroid-cosine first (the paper keeps
      the member FARTHEST from the centroid, maximizing retained
      diversity), then lower ``vec_id``.  The preference order is total,
      so exactly the non-minimal members of every near-dup relation are
      removed — no transitive closure and no RNG, which keeps the DuckDB
      oracle a single EXISTS join (catalog row ``embedding_semdedup``).

    Degenerate (all-zero) vectors have NULL cosine everywhere (family
    contract, :func:`cosine`): they are never removed and never remove
    others — every preference comparison and tau test against them is
    NULL.

    Cost shape and gate: candidate generation is an equi-join on
    ``cell_id`` (one shuffle of n rows each side); the exact cosines run
    over the BOUNDED within-cell pair set via the Arrow verify path
    (:func:`verify_cosine_pairs`).  Before any quadratic work starts,
    the within-cell pair count ``sum_c c·(c-1)/2`` — one scalar
    aggregate row, however many cells — is priced against the family's
    scale-linear budget
    (``max(n · pair_budget_per_vec, budget_floor)``), and a breach
    raises with the remedy named (raise ``n_cells``: more cells = both
    smaller pairs AND a finer dedup radius, the paper's own scaling
    story).  A skewed mega-cell therefore fails loudly instead of
    detonating a shuffle.
    """
    from tg_reporting_etl_spark.functions.persist import tracked_persist

    if n_cells is None and centroids is None:
        # auto-size BEFORE any quadratic shape exists: one metadata-cheap
        # count, then k grows linearly with the corpus (occupancy ~64)
        n_cells = max(16, embeddings.count() // 64)
    cents = _fixed_centroids(embeddings, n_cells) if centroids is None else centroids
    assigned = tracked_persist(ivf_assign(embeddings, n_cells, cents))

    # price the within-cell pair space as a SCALAR aggregate — with the
    # auto-sized quantizer k grows ~n/64, so a per-cell collect would
    # itself scale with the corpus; the two sums reduce to one row
    # however many cells exist (same `c * (c - 1) div 2` slot algebra
    # as the banded gate's pricing)
    stats = (
        assigned.groupBy("cell_id")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.expr("c * (c - 1) div 2")).alias("est"),
        )
        .first()
    )
    n = int(stats["n"] or 0)
    est = int(stats["est"] or 0)
    budget = max(n * pair_budget_per_vec, budget_floor)
    if path_sink is not None:
        path_sink.update(n_vecs=n, est_pairs=est, budget=budget, n_cells=n_cells)
    if est > budget:
        raise ValueError(
            f"semdedup: within-cell pair space is {est:,} exact cosines for "
            f"{n:,} vectors in {n_cells} cells (budget {budget:,}) — the cells "
            f"are too coarse for this corpus. Raise n_cells (smaller cells = "
            f"fewer pairs and a finer dedup radius) or raise the budget "
            f"explicitly."
        )

    # centroid_cos stays a JVM-side fold (same sequential double math as
    # the DuckDB oracle — bit-identical at the 6dp round); the pandas
    # stage below consumes it for the preference order and returns it
    # unchanged, so the only numpy float path is the pairwise cosine
    # matrix, whose 6dp GEMM-vs-fold agreement the blocked-GEMM row
    # already pins oracle-exact
    members = assigned.join(F.broadcast(cents), "cell_id").select(
        "vec_id",
        "cell_id",
        "embedding",
        F.round(cosine(F.col("embedding"), F.col("c_emb")), 6).alias("centroid_cos"),
    )

    def _cell_dedup(pdf):
        import numpy as np

        E = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        defined = (norms > 0.0).ravel()  # degenerate vectors: NULL cosine
        U = E / np.maximum(norms, 1e-300)
        C = np.round(U @ U.T, 6)
        ccos = pdf["centroid_cos"].to_numpy(dtype="float64")  # NaN when NULL
        ids = pdf["vec_id"].to_numpy()
        # preference matrix P[i, j]: i preferred over j — strictly lower
        # rounded centroid cosine, then lower vec_id; any comparison
        # against a NULL centroid cosine is NULL -> no preference
        cdef = defined & ~np.isnan(ccos)
        both = np.outer(cdef, cdef)
        P = both & (
            (ccos[:, None] < ccos[None, :])
            | ((ccos[:, None] == ccos[None, :]) & (ids[:, None] < ids[None, :]))
        )
        removed = (P & (C >= tau)).any(axis=0)
        out = pdf.assign(removed=removed)[["vec_id", "cell_id", "centroid_cos", "removed"]]
        # NULL centroid_cos crossed Arrow as NaN; send it back as NULL
        # (the family's degenerate-vector contract), never NaN
        if np.isnan(ccos).any():
            out = out.assign(
                centroid_cos=[None if np.isnan(c) else float(c) for c in ccos]
            )
        return out

    # ONE shuffle on cell_id; each cell is a bounded GEMM (the gate above
    # refused any corpus whose cells grew quadratic-large), so the whole
    # dedup is a single applyInPandas pass — the paper's implementation
    # shape, with no materialized pair table
    return members.groupBy("cell_id").applyInPandas(
        _cell_dedup, "vec_id long, cell_id long, centroid_cos double, removed boolean"
    )
