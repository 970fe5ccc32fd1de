"""Scale-feasible independent checks for the sf1.0 probe rows whose
DuckDB mirrors are infeasible on the dup-heavy derived corpus.

The five rows (three near-dup PAIR rows, two CONNECTED-COMPONENTS rows)
were previously `rows_only` at the 10x probe because their nested duck
oracles are quadratic (per-bucket pair fan-out x45) or recursive-CTE
explosive (reachability closure over replica cliques).  Independence
does not require the quadratic mirror — the derived corpus is a KNOWN
construction (REPLICAS byte-identical key-shifted copies of the base
sf, see tools/scale_probe.build), so the exact expected result is
computable from linear/bounded work:

PAIR rows (doc_ngram_jaccard_dups, doc_minhash_lsh_dups,
doc_ngram_jaccard_lsh) — three named checks, together a FULL oracle:

1. ``replica_symmetry`` — candidacy (shared df-capped shingle, or a
   MinHash band collision) and Jaccard are pure functions of the
   shingle SET, which is byte-identical across replicas; so the emitted
   pair set must be a union of complete replica groups: exactly
   C(R,2)=45 pairs per base doc on the diagonal (all at jaccard 1.0)
   and exactly R^2=100 pairs per cross-doc base pair, constant jaccard
   within each group.  Checked in pandas over the full result —
   linear.
2. ``base_tieout`` — the set of base-level pairs/diagonal docs is
   computed EXACTLY by the same oracle SQL on the BASE sf corpus
   (tractable there: verify_local runs it every round), with the df
   cap rescaled to cap//REPLICAS for the capped row (each shingle's df
   at 10x is exactly 10x its base df).  MinHash band keys depend only
   on the shingle set, so LSH candidacy at 10x == base candidacy, and
   replica cliques always collide (identical signatures).  Engine base
   pair set, per-pair jaccard, and diagonal doc set must all match.
   Together with (1) this determines the full 10x result: the row is
   exactly {100 x base pairs} U {45 x diagonal docs}.
3. ``sampled_exact_jaccard`` — belt-and-braces against the derivation
   assumption itself: a deterministic md5-ordered sample of <=1000
   emitted pairs has its exact set-Jaccard recomputed from RAW TEXT by
   DuckDB on the derived corpus, restricted to the sampled doc_ids
   (linear, never all-pairs).  Every sampled pair must reproduce its
   emitted jaccard and clear tau.

COMPONENTS rows (doc_dup_components, embedding_dup_components) — the
pair graph each is built over is itself verified (the lexical graph by
the checks above — same session-cached frame; the embedding graph by
the ``embedding_dup_pairs_banded`` full oracle row that runs earlier in
the same probe), so what needs independent proof is the LABELING:

1. ``driver_union_find`` — a full independent connected-components run
   (pure-Python union-find with path halving, min-member labels) over
   the identical edge list, compared for exact (node, label) equality.
   Catches over- and under-merge everywhere, not on a sample.
2. ``keeper_uniqueness`` — exactly one is_keeper per component, and the
   keeper's id equals the component label.
3. ``label_is_min_member`` — each label equals the min member id of its
   component (asserted from the result alone, independent of (1)).

Every check returns a small dict recorded verbatim in the probe
artifact; a row is ok only if all its checks pass.
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import pandas as pd

REPLICAS = 10
#: per-replica id offset used by scale_probe.build — far above any base key
OFFSET = 10_000_000_000

_DIAG_N = REPLICAS * (REPLICAS - 1) // 2
_CROSS_N = REPLICAS * REPLICAS

_base_con_memo: dict = {}
_base_pairs_memo: dict = {}


def _base_con(base_src: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with views over the BASE (pre-replication) sf
    dir — the tractable side of the tie-out."""
    if base_src not in _base_con_memo:
        con = duckdb.connect()
        p = os.path.join(base_src, "documents.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet({src})")
        _base_con_memo[base_src] = con
    return _base_con_memo[base_src]


def _replica_symmetry(sdf: pd.DataFrame) -> tuple[dict, pd.DataFrame]:
    """Group the emitted pairs by normalized base-pair key; assert the
    complete-group shape.  Returns (check record, per-group frame) —
    the group frame feeds the base tie-out."""
    df = sdf[["doc_a", "doc_b", "jaccard"]].copy()
    ba, bb = df["doc_a"] % OFFSET, df["doc_b"] % OFFSET
    df["u"], df["v"] = ba.where(ba <= bb, bb), bb.where(ba <= bb, ba)
    g = (
        df.groupby(["u", "v"])["jaccard"]
        .agg(n="size", nuniq="nunique", j="first")
        .reset_index()
    )
    diag, off = g[g.u == g.v], g[g.u != g.v]
    bad_diag_n = int((diag.n != _DIAG_N).sum())
    bad_off_n = int((off.n != _CROSS_N).sum())
    bad_const = int((g.nuniq != 1).sum())
    bad_diag_j = int((diag.j != 1.0).sum())
    rec = {
        "ok": not (bad_diag_n or bad_off_n or bad_const or bad_diag_j),
        "pairs": int(len(df)),
        "base_groups_diag": int(len(diag)),
        "base_groups_cross": int(len(off)),
        "expected_group_sizes": {"diag": _DIAG_N, "cross": _CROSS_N},
        "violations": {
            "diag_size": bad_diag_n,
            "cross_size": bad_off_n,
            "jaccard_not_constant_in_group": bad_const,
            "diag_jaccard_not_1": bad_diag_j,
        },
    }
    return rec, g


def _base_expected(kind: str, base_src: str) -> tuple[pd.DataFrame, set]:
    """Exact expected (base pair set + jaccard, diagonal doc set) under
    10x replication, computed on the BASE corpus in bounded time."""
    key = (kind, base_src)
    if key in _base_pairs_memo:
        return _base_pairs_memo[key]
    from tg_reporting_etl_spark.functions import dedup as dd
    from tg_reporting_etl_spark.plans import llm_plans as lp

    con = _base_con(base_src)
    if kind == "ngram_capped":
        # at 10x every shingle's df is exactly REPLICAS x its base df,
        # so the 10x cap translates to cap // REPLICAS on the base side
        cap = dd._CAPPED_MAX_DF  # noqa: SLF001 — probe mirrors the engine constant
        scaled = lp._NGRAM_ORACLE.replace(  # noqa: SLF001
            f"count(*) <= {cap}", f"count(*) <= {cap // REPLICAS}"
        )
        assert scaled != lp._NGRAM_ORACLE, "df-cap substitution did not apply"  # noqa: SLF001
        pairs = con.execute(scaled).df()
        diag_sql = f"""WITH {lp._SHINGLES.strip()},
q AS (SELECT shingle FROM shingles GROUP BY 1 HAVING count(*) <= {cap // REPLICAS})
SELECT DISTINCT s.doc_id FROM shingles s JOIN q USING (shingle)"""  # noqa: SLF001
    else:  # minhash-LSH candidate family (shared by both LSH rows)
        # band keys are functions of the shingle SET -> identical across
        # replicas: cross-doc candidacy at 10x == base candidacy, and
        # replica cliques always collide (jaccard 1 >= tau)
        pairs = con.execute(lp._minhash_oracle()).df()  # noqa: SLF001
        diag_sql = f"WITH {lp._SHINGLES.strip()} SELECT DISTINCT doc_id FROM shingles"  # noqa: SLF001
    diag = {int(x) for (x,) in con.execute(diag_sql).fetchall()}
    out = (pairs, diag)
    _base_pairs_memo[key] = out
    return out


def _base_tieout(kind: str, base_src: str, groups: pd.DataFrame) -> dict:
    exp_pairs, exp_diag = _base_expected(kind, base_src)
    got_diag = {int(u) for u in groups.loc[groups.u == groups.v, "u"]}
    off = groups[groups.u != groups.v]
    got_pairs = {(int(a), int(b)) for a, b in zip(off.u, off.v)}
    exp_set = {
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(exp_pairs.doc_a, exp_pairs.doc_b)
    }
    # per-pair jaccard: engine 10x value vs base oracle value (both
    # round-6 of the identical rational — bit-equal in every committed
    # sf0.01/sf0.1 full-hash run; 1e-9 absorbs float repr only)
    exp_j = {
        (min(int(a), int(b)), max(int(a), int(b))): float(j)
        for a, b, j in zip(exp_pairs.doc_a, exp_pairs.doc_b, exp_pairs.jaccard)
    }
    j_mismatch = sum(
        1
        for u, v, j in zip(off.u, off.v, off.j)
        if (int(u), int(v)) in exp_j and abs(exp_j[(int(u), int(v))] - float(j)) > 1e-9
    )
    return {
        "ok": got_pairs == exp_set and got_diag == exp_diag and j_mismatch == 0,
        "base_cross_pairs": {"expected": len(exp_set), "got": len(got_pairs),
                             "missing": len(exp_set - got_pairs),
                             "extra": len(got_pairs - exp_set)},
        "diag_docs": {"expected": len(exp_diag), "got": len(got_diag),
                      "missing": len(exp_diag - got_diag),
                      "extra": len(got_diag - exp_diag)},
        "jaccard_mismatches": j_mismatch,
        "implied_total": _CROSS_N * len(exp_set) + _DIAG_N * len(exp_diag),
    }


def _sampled_exact_jaccard(
    con: duckdb.DuckDBPyConnection, sdf: pd.DataFrame, tau: float, n: int = 1000
) -> dict:
    """Recompute exact set-Jaccard from raw text for a deterministic
    md5-ordered sample of emitted pairs, on the DERIVED corpus itself."""
    df = sdf[["doc_a", "doc_b", "jaccard"]].copy()
    key = (df.doc_a.astype(str) + "|" + df.doc_b.astype(str)).map(
        lambda s: hashlib.md5(s.encode()).hexdigest()
    )
    sample = df.loc[key.sort_values().index[:n]].reset_index(drop=True)
    con.register("probe_sampled_pairs", sample)
    out = con.execute(
        """WITH sel AS (SELECT doc_a AS doc_id FROM probe_sampled_pairs
                UNION SELECT doc_b FROM probe_sampled_pairs),
docs AS (SELECT d.doc_id, d.text FROM documents d JOIN sel USING (doc_id)),
shingles AS (
  SELECT DISTINCT doc_id, substr(text, i, 5) AS shingle
  FROM docs, unnest(generate_series(1, length(text) - 4)) t(i)
  WHERE length(text) >= 5
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS s_n FROM shingles GROUP BY 1),
inter AS (
  SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS c
  FROM probe_sampled_pairs p
  JOIN shingles x ON x.doc_id = p.doc_a
  JOIN shingles y ON y.doc_id = p.doc_b AND y.shingle = x.shingle
  GROUP BY 1, 2
)
SELECT p.jaccard AS emitted,
       ROUND(COALESCE(i.c, 0) * 1.0
             / (sx.s_n + sy.s_n - COALESCE(i.c, 0)), 6) AS exact_j
FROM probe_sampled_pairs p
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
JOIN sizes sx ON sx.doc_id = p.doc_a
JOIN sizes sy ON sy.doc_id = p.doc_b"""
    ).df()
    con.unregister("probe_sampled_pairs")
    mismatches = int(((out.exact_j - out.emitted).abs() > 1e-9).sum())
    below_tau = int((out.exact_j < tau).sum())
    return {
        "ok": len(out) == len(sample) and mismatches == 0 and below_tau == 0,
        "sampled": int(len(sample)),
        "recomputed": int(len(out)),
        "jaccard_mismatches": mismatches,
        "below_tau": below_tau,
    }


def _pair_checks(kind: str):
    def run(spark, con, sdf, sf1_dir: str, base_src: str) -> dict:
        from tg_reporting_etl_spark.plans.llm_plans import JACCARD_TAU

        sym, groups = _replica_symmetry(sdf)
        tie = _base_tieout(kind, base_src, groups)
        samp = _sampled_exact_jaccard(con, sdf, JACCARD_TAU)
        return {
            "ok": sym["ok"] and tie["ok"] and samp["ok"],
            "replica_symmetry": sym,
            "base_tieout": tie,
            "sampled_exact_jaccard": samp,
        }

    return run


def _union_find_labels(edges: pd.DataFrame) -> set:
    """Exact (node, min-member label) set via pure-Python union-find
    with path halving — the independent algorithm the engine's
    distributed min-label propagation is compared against."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges.iloc[:, 0].astype(int), edges.iloc[:, 1].astype(int)):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    roots: dict[int, int] = {}
    for x in parent:
        r = find(x)
        roots[r] = min(roots.get(r, x), x)
    return {(x, roots[find(x)]) for x in parent}


def _component_checks(which: str):
    def run(spark, con, sdf, sf1_dir: str, base_src: str) -> dict:
        from tg_reporting_etl_spark.plans import llm_plans as lp

        if which == "doc":
            edges = (
                lp._capped_pairs(spark, sf1_dir)  # noqa: SLF001 — same cached frame the engine labeled
                .select("doc_a", "doc_b")
                .toPandas()
            )
            id_col = "doc_id"
            verified_by = "doc_ngram_jaccard_dups probe checks (identical session-cached pair frame)"
        else:
            edges = (
                lp._banded_emb_pairs(spark, sf1_dir)  # noqa: SLF001
                .select("vec_a", "vec_b")
                .toPandas()
            )
            id_col = "vec_id"
            verified_by = "embedding_dup_pairs_banded full-oracle probe row (identical session-cached pair frame)"

        expected = _union_find_labels(edges)
        got = {(int(i), int(c)) for i, c in zip(sdf[id_col], sdf.component_id)}
        uf = {
            "ok": got == expected,
            "edges": int(len(edges)),
            "nodes": len({x for x, _ in expected}),
            "components": len({c for _, c in expected}),
            "missing": len(expected - got),
            "extra": len(got - expected),
            "edge_list_verified_by": verified_by,
        }
        keepers = sdf[sdf.is_keeper]
        comp_min = sdf.groupby("component_id")[id_col].min()
        keep = {
            "ok": bool(
                len(keepers) == sdf.component_id.nunique()
                and (keepers[id_col] == keepers.component_id).all()
                and keepers.component_id.is_unique
            ),
            "keepers": int(len(keepers)),
            "components": int(sdf.component_id.nunique()),
        }
        minm = {
            "ok": bool((comp_min.index == comp_min.values).all()),
            "violations": int((comp_min.index != comp_min.values).sum()),
        }
        return {
            "ok": uf["ok"] and keep["ok"] and minm["ok"],
            "driver_union_find": uf,
            "keeper_uniqueness": keep,
            "label_is_min_member": minm,
        }

    return run


#: probe-row name -> check callable(spark, duck_con_sf1, result_pdf,
#: sf1_dir, base_src) -> record (with top-level "ok")
INDEPENDENT_CHECKS = {
    "doc_ngram_jaccard_dups": _pair_checks("ngram_capped"),
    "doc_minhash_lsh_dups": _pair_checks("minhash"),
    "doc_ngram_jaccard_lsh": _pair_checks("minhash"),
    "doc_dup_components": _component_checks("doc"),
    "embedding_dup_components": _component_checks("emb"),
}
