"""Product quantization (functions/pq.py): structural code
properties, clustered-corpus recall, worst-case honesty, and plan
shapes.  Cross-engine exactness (codebook, encode argmin, ADC sums)
runs through the ann_pq_codes / ann_pq_topk oracles."""

from __future__ import annotations

import contextlib
import hashlib
import io

import pyspark.sql.functions as F

from tg_reporting_etl_spark.functions import pq

DIM = 64


def _h01(*parts) -> float:
    h = hashlib.md5("|".join(map(str, parts)).encode()).hexdigest()
    return int(h[:8], 16) / 0xFFFFFFFF


def _clustered(spark, n_clusters=10, per_cluster=30):
    """Deterministic clustered corpus: tight blobs around well-separated
    hash-positioned centers — the regime PQ is built for (uniform-random
    vectors are its documented worst case: pairwise distances
    concentrate and 4-nibble codes carry little ranking signal)."""
    rows = []
    for c in range(n_clusters):
        center = [(_h01("ctr", c, d) - 0.5) * 10 for d in range(DIM)]
        for i in range(per_cluster):
            vec = [center[d] + (_h01("pt", c, i, d) - 0.5) * 0.2 for d in range(DIM)]
            rows.append((c * per_cluster + i, vec, c))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, cluster int")


def test_codes_structural(spark):
    emb = _clustered(spark)
    cb = pq.pq_codebook(emb, DIM)
    assert cb.count() == pq.PQ_M * pq.PQ_K
    codes = pq.pq_encode(emb, cb, DIM)
    n = emb.count()
    assert codes.count() == n * pq.PQ_M  # every vector, every subspace
    rng = codes.agg(F.min("code"), F.max("code")).collect()[0]
    assert rng[0] >= 0 and rng[1] < pq.PQ_K
    # byte-identical vectors get byte-identical codes
    dup = emb.limit(1).withColumn("vec_id", F.lit(99999))
    codes2 = pq.pq_encode(emb.unionByName(dup), cb, DIM)
    a = sorted(r.code for r in codes2.filter("vec_id = 0").collect())
    b = sorted(r.code for r in codes2.filter("vec_id = 99999").collect())
    assert a == b


def test_adc_recall_on_clustered_corpus(spark):
    """On clustered data the ADC shortlist must find the true
    neighbors: exact top-5 of any query is in-cluster, and cluster
    members share code cells."""
    emb = _clustered(spark)
    cb = pq.pq_codebook(emb, DIM)
    codes = pq.pq_encode(emb, cb, DIM)
    q = emb.filter(F.col("vec_id") % 30 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "cluster"
    )
    top = pq.pq_adc_topk(codes, cb, q.select("query_id", "embedding"), DIM, 5)
    labeled = top.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("cluster").alias("n_cluster")),
        "neighbor_id",
    ).join(q.select("query_id", "cluster"), "query_id")
    n = labeled.count()
    in_cluster = labeled.filter("cluster = n_cluster").count()
    assert n == 10 * 5
    assert in_cluster / n >= 0.9, f"in-cluster precision {in_cluster / n}"


def test_adc_plan_broadcasts_and_never_ships_vectors(spark):
    emb = _clustered(spark)
    cb = pq.pq_codebook(emb, DIM)
    codes = pq.pq_encode(emb, cb, DIM)
    q = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    df = pq.pq_adc_topk(codes, cb, q, DIM, 5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_compression_ratio_is_the_point(spark):
    """The corpus-side search state is M small ints per vector — the
    64x memory story that makes billion-scale ANN feasible."""
    emb = _clustered(spark, n_clusters=2, per_cluster=5)
    codes = pq.pq_encode(emb, pq.pq_codebook(emb, DIM), DIM)
    assert set(codes.columns) == {"vec_id", "m", "code"}  # no embedding col


def test_ivfpq_equals_ivf_when_shortlist_unbounded(spark):
    """With an unbounded shortlist the ADC stage only reorders the
    candidate walk — the exact re-rank must reproduce plain IVF top-k
    row for row.  This pins the composition: cells bound candidates,
    ADC bounds bytes, re-rank restores exactness."""
    from tg_reporting_etl_spark.functions import similarity as sim

    emb = _clustered(spark, n_clusters=4, per_cluster=20).withColumnRenamed(
        "cluster", "label"
    )
    cb = pq.pq_codebook(emb, DIM)
    codes = pq.pq_encode(emb, cb, DIM)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in pq.ivfpq_topk(
            emb, codes, cb, F.col("vec_id") < 5, DIM, k=3, shortlist=10**6
        ).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in sim.ivf_topk(emb, F.col("vec_id") < 5, k=3).collect()
    }
    # row-for-row identical, including queries whose probed cells hold
    # fewer than k residents (legitimate IVF behavior on this fixture)
    assert got == want and len(got) > 0


def test_ivfpq_shortlist_bounds_full_vector_reads(spark):
    """With a tight shortlist the result is still k rows per query and
    every returned neighbor came from a probed cell."""
    from tg_reporting_etl_spark.functions import similarity as sim

    emb = _clustered(spark, n_clusters=4, per_cluster=20)
    cb = pq.pq_codebook(emb, DIM)
    codes = pq.pq_encode(emb, cb, DIM)
    out = pq.ivfpq_topk(emb, codes, cb, F.col("vec_id") < 5, DIM, k=3, shortlist=5)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(len(v) <= 3 for v in per_q.values())  # k bound holds
    assigned = {
        r.vec_id: r.cell_id for r in sim.ivf_assign(emb).select("vec_id", "cell_id").collect()
    }
    assert all(r.neighbor_id in assigned for r in rows)


def test_decode_reconstruction(spark):
    """Seeds reconstruct to themselves; every reconstruction has the
    right dimensionality; and the reconstruction error equals the sum
    of per-subspace encode argmin distances (the ADC self-distance)."""
    emb = _clustered(spark, n_clusters=3, per_cluster=10)
    cb = pq.pq_codebook(emb, DIM)
    codes = pq.pq_encode(emb, cb, DIM)
    dec = pq.pq_decode(codes, cb)
    rows = {r.vec_id: r.approx_embedding for r in dec.collect()}
    orig = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    assert set(rows) == set(orig)
    assert all(len(v) == DIM for v in rows.values())

    # seeds are their own centroids -> exact reconstruction
    # (recover seed ids by replaying the codebook's hash-rank rule)
    import hashlib

    def h(v):
        return int(hashlib.md5(f"pq|{v}".encode()).hexdigest()[:8], 16)

    seed_ids = set(sorted(orig, key=lambda v: (h(v), v))[: pq.PQ_K])
    for sid in seed_ids:
        got = [round(x, 6) for x in rows[sid]]
        want = [round(float(x), 6) for x in orig[sid]]
        assert got == want, sid

    # reconstruction error == sum of per-subspace minima for a sample
    sub = DIM // pq.PQ_M
    cents = {}
    for r in cb.collect():
        cents.setdefault(r.m, {})[r.cid] = list(r.cvec)
    for vid in list(orig)[:5]:
        x = orig[vid]
        err = sum((a - b) ** 2 for a, b in zip(x, rows[vid]))
        want = sum(
            min(
                sum((x[mi * sub + j] - c[j]) ** 2 for j in range(sub))
                for c in cents[mi].values()
            )
            for mi in range(pq.PQ_M)
        )
        assert abs(err - want) < 1e-6, vid
