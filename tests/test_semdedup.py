"""Cell-bounded semantic dedup (SemDeDup) — functions/similarity.semdedup.

Reference capability: the embedding-cosine near-dup family (SURVEY §2.13);
this operator is the cluster-then-dedup variant of it (SemDeDup, Abbas
et al. 2023, arXiv:2303.09540).  The catalog row ``embedding_semdedup``
carries the full DuckDB oracle; these tests pin the SEMANTICS the oracle
alone can't explain — keeper choice, chain behavior, the degenerate
vector contract, and the self-pricing gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions import similarity as sim


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _cents(spark, rows):
    return spark.createDataFrame(rows, "cell_id long, c_emb array<float>")


@pytest.fixture(scope="module")
def two_cells(spark):
    """Two well-separated cells with controlled geometry.

    Cell 0 (centroid (1,0)): a=(0.9,0.1) and b=(0.95,0.05) are mutual
    near-dups (cos ≈ 0.997); a is FARTHER from the centroid.  c=(0,0)
    is degenerate.  Cell 1 (centroid (0,1)): d alone.
    """
    emb = _df(
        spark,
        [
            (1, [0.9, 0.1]),
            (2, [0.95, 0.05]),
            (3, [0.0, 0.0]),
            (4, [0.05, 1.0]),
        ],
    )
    cents = _cents(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    return emb, cents


def test_keeper_is_farthest_from_centroid(spark, two_cells):
    """The paper's keeper rule: of a near-dup pair, the member with the
    LOWER centroid cosine survives — dedup keeps the cell's diversity,
    not its mode."""
    emb, cents = two_cells
    out = {r.vec_id: r for r in sim.semdedup(emb, 0.9, centroids=cents).collect()}
    assert len(out) == 4
    assert not out[1].removed  # farther from centroid -> preferred -> kept
    assert out[2].removed  # its near-dup, closer to centroid -> removed
    assert not out[4].removed  # alone in its cell
    assert out[1].centroid_cos < out[2].centroid_cos


def test_degenerate_vector_never_removes_or_is_removed(spark, two_cells):
    """Family contract: an all-zero vector has NULL cosine everywhere,
    so every preference comparison and tau test involving it is NULL —
    it neither removes nor gets removed, at ANY tau."""
    emb, cents = two_cells
    out = {r.vec_id: r for r in sim.semdedup(emb, -1.0, centroids=cents).collect()}
    assert out[3].centroid_cos is None
    assert not out[3].removed
    # and at tau=-1 every defined same-cell pair IS a near-dup: the
    # non-preferred defined member of cell 0 is removed, 3 is untouched
    assert out[2].removed and not out[1].removed


def test_chain_removal_is_exists_not_closure(spark):
    """Chain v1~v2~v3 with the ends NOT near-dups of each other, on a
    centroid at v1's angle: preference ascends away from the centroid
    (v3 most preferred, then v2, then v1).  v2 is removed by v3; v1 is
    removed by v2 EVEN THOUGH v2 is itself removed — the EXISTS
    semantics of the paper's implementation, and the reason the DuckDB
    oracle needs no recursive closure."""
    # unit vectors at 0°, 35°, 70°: cos(0,35)=cos(35,70)≈0.819,
    # cos(0,70)≈0.342 — tau=0.8 links only the adjacent pairs
    import math

    def u(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    emb = _df(spark, [(1, u(0)), (2, u(35)), (3, u(70))])
    cents = _cents(spark, [(0, u(0))])
    out = {r.vec_id: r for r in sim.semdedup(emb, 0.8, centroids=cents).collect()}
    # centroid_cos: v1=1.0, v2≈0.819, v3≈0.342 — farthest survives
    assert not out[3].removed
    assert out[2].removed  # removed by the more-distant v3
    assert out[1].removed  # removed by v2 despite v2's own removal


def test_gate_refuses_past_budget_and_names_the_knob(spark, two_cells):
    emb, cents = two_cells
    sink: dict = {}
    with pytest.raises(ValueError, match="n_cells"):
        sim.semdedup(
            emb, 0.9, centroids=cents, pair_budget_per_vec=0, budget_floor=0, path_sink=sink
        )
    assert sink["n_vecs"] == 4
    assert sink["est_pairs"] == 3  # C(3,2) in cell 0 + C(1,2) in cell 1
    assert sink["budget"] == 0


def test_gate_prices_before_quadratic_work(spark, two_cells):
    """path_sink records the pricing on the allowed path too, and the
    estimate is the exact within-cell pair count."""
    emb, cents = two_cells
    sink: dict = {}
    out = sim.semdedup(emb, 0.9, centroids=cents, path_sink=sink)
    assert out.count() == 4
    assert sink["est_pairs"] == 3 and sink["budget"] > 0


def test_semdedup_composes_with_trained_quantizer(spark):
    """Production path: kmeans_centroids output drops straight in as
    ``centroids`` — on clustered data every near-dup clique lands whole
    inside one trained cell, so exactly one member per clique survives
    (its farthest-from-centroid representative)."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 10, (8, 8))
    # 8 tight cliques of 20: perturbation sigma 0.02 vs center spread
    # sigma 10 puts intra-clique cosine ~0.999998, cross-clique far below
    rows = [
        (i, [float(x) for x in centers[i % 8] + rng.normal(0, 0.02, 8)])
        for i in range(160)
    ]
    emb = _df(spark, rows)
    cents = sim.kmeans_centroids(emb, n_cells=8, seed=7)
    out = sim.semdedup(emb, 0.999, centroids=cents)
    kept = out.filter(~F.col("removed")).count()
    # 8 tight cliques of 20 near-identical members -> 8 survivors
    assert kept == 8
    assert out.count() == 160


def test_auto_cell_count_scales_with_corpus(spark):
    """n_cells=None sizes the quantizer to max(16, n // 64): expected
    occupancy — and the within-cell pair space per vector — is constant
    in n, the property that keeps the operator linear at 100 TB."""
    import numpy as np

    rng = np.random.default_rng(3)
    emb = _df(
        spark, [(i, [float(x) for x in rng.normal(0, 1, 4)]) for i in range(2048)]
    )
    sink: dict = {}
    out = sim.semdedup(emb, 0.99, path_sink=sink)
    assert sink["n_cells"] == 32  # 2048 // 64
    assert out.count() == 2048
    # small corpora never drop below the 16-cell floor
    small = _df(spark, [(i, [float(i), 1.0]) for i in range(40)])
    sink2: dict = {}
    sim.semdedup(small, 0.99, path_sink=sink2).count()
    assert sink2["n_cells"] == 16


def test_fixed_quantizer_matches_catalog_row_shape(spark):
    """Default (no centroids) path: first-n_cells fixed quantizer, the
    oracle-checked variant the catalog row runs — schema and row count
    are (vec_id, cell_id, centroid_cos, removed) x n."""
    import numpy as np

    rng = np.random.default_rng(7)
    emb = _df(
        spark, [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(40)]
    )
    out = sim.semdedup(emb, 0.45, n_cells=4)
    assert [f.name for f in out.schema.fields] == [
        "vec_id",
        "cell_id",
        "centroid_cos",
        "removed",
    ]
    assert out.count() == 40
    assert out.filter(F.col("cell_id") >= 4).count() == 0
