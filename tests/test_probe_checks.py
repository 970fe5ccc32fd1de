"""tools/probe_checks — the scale-feasible independent checks that
replaced the sf1.0 probe's five `oracle_skipped` rows (r15).

Strategy: (a) unit-test the pure check primitives on synthetic frames,
including that each DETECTS the defect class it exists for (a check
that cannot fail is not a check); (b) run the full pair+component check
stack end-to-end on a real derived corpus (scale_probe.build over
sf0.001 — same construction as the probe, 100x smaller: the probe
builds from sf0.1, both with 10x replicas) and require all-green
against the real engine output.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from tools import probe_checks as pc
from tools import scale_probe as sp

# --------------------------------------------------------------- primitives


def _expand(base_pairs, diag_docs):
    """Perfect replica expansion of a base result — what the engine
    must emit on a derived corpus."""
    rows = []
    for u, v, j in base_pairs:
        for i in range(pc.REPLICAS):
            for k in range(pc.REPLICAS):
                a, b = u + i * pc.OFFSET, v + k * pc.OFFSET
                rows.append((min(a, b), max(a, b), j))
    for d in diag_docs:
        for i in range(pc.REPLICAS):
            for k in range(i + 1, pc.REPLICAS):
                rows.append((d + i * pc.OFFSET, d + k * pc.OFFSET, 1.0))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def test_replica_symmetry_accepts_perfect_expansion():
    sdf = _expand([(3, 7, 0.5), (7, 9, 0.4)], [3, 7, 9])
    rec, groups = pc._replica_symmetry(sdf)
    assert rec["ok"], rec
    assert rec["base_groups_diag"] == 3 and rec["base_groups_cross"] == 2
    assert len(groups) == 5


@pytest.mark.parametrize(
    "mutate, violated",
    [
        (lambda d: d.iloc[1:], "cross_size"),  # drop one cross pair
        (lambda d: d.assign(jaccard=d.jaccard.where(d.index != 0, 0.9)),
         "jaccard_not_constant_in_group"),
        (lambda d: pd.concat(  # diag group at jaccard != 1
            [d, pd.DataFrame([(5, 5 + pc.OFFSET, 0.7)], columns=d.columns)]
        ), "diag_jaccard_not_1"),
    ],
)
def test_replica_symmetry_detects_defects(mutate, violated):
    sdf = mutate(_expand([(3, 7, 0.5)], [3]))
    rec, _ = pc._replica_symmetry(sdf)
    assert not rec["ok"]
    assert rec["violations"][violated] > 0, rec


def test_union_find_labels_min_member():
    edges = pd.DataFrame(
        {"doc_a": [1, 2, 9, 40], "doc_b": [2, 3, 1, 41]}
    )  # {1,2,3,9} and {40,41}
    labels = pc._union_find_labels(edges)
    assert labels == {(1, 1), (2, 1), (3, 1), (9, 1), (40, 40), (41, 40)}


# ------------------------------------------------------------- end-to-end

# built from sf0.001 with the probe's 10x replicas -> effective sf0.01;
# the name spells out the construction so it cannot be misread as a
# corpus derived FROM sf0.01 (r15 ADVICE item 3)
DERIVED = "/tmp/spark_graft_probe_checks_sf0.001_x10"


@pytest.fixture(scope="module")
def derived(spark):
    """A real derived corpus (scale_probe.build over sf0.001) plus the
    sf1-style duck connection — the exact probe setup, 100x smaller."""
    import duckdb

    src = "/root/testdata/sf0.001"
    sp.build(spark, src, DERIVED)
    con = duckdb.connect()
    p = os.path.join(DERIVED, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    return src, con


@pytest.mark.parametrize(
    "name", ["doc_ngram_jaccard_dups", "doc_minhash_lsh_dups", "doc_dup_components"]
)
def test_independent_checks_green_on_real_engine_output(spark, derived, name):
    import __spark_entry__ as em

    src, con = derived
    sdf = em.queries()[name](spark, DERIVED).toPandas()
    assert len(sdf) > 0
    res = pc.INDEPENDENT_CHECKS[name](spark, con, sdf, DERIVED, src)
    assert res["ok"], res


def test_component_check_detects_overmerge(spark, derived):
    """Two disconnected components fused under one label must fail the
    driver union-find comparison."""
    import __spark_entry__ as em

    src, con = derived
    sdf = em.queries()["doc_dup_components"](spark, DERIVED).toPandas()
    labels = sorted(sdf.component_id.unique())
    assert len(labels) >= 2
    fused = sdf.copy()
    fused.loc[fused.component_id == labels[-1], "component_id"] = labels[0]
    fused["is_keeper"] = fused.doc_id == fused.component_id
    res = pc.INDEPENDENT_CHECKS["doc_dup_components"](spark, con, fused, DERIVED, src)
    assert not res["ok"]
    assert not res["driver_union_find"]["ok"]
