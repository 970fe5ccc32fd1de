"""Deterministic sampling: mixing weights, quota exactness, stability."""

from __future__ import annotations

import pyspark.sql.functions as F

from tg_reporting_etl_spark.functions import sampling as sp
from tg_reporting_etl_spark.sources.readers import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_stratified_sample_is_deterministic_and_weighted(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    fr = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    a = {r.doc_id for r in sp.stratified_sample(docs, "source", fr).collect()}
    b = {r.doc_id for r in sp.stratified_sample(docs, "source", fr).collect()}
    assert a == b  # pure function of (key, salt)

    out = sp.stratified_sample(docs, "source", fr).groupBy("source").count()
    got = {r.source: r["count"] for r in out.collect()}
    n = {r.source: r["count"] for r in docs.groupBy("source").count().collect()}
    assert got.get("src0", 0) == n["src0"]          # fraction 1.0 keeps all
    assert "src2" not in got                        # fraction 0.0 keeps none
    assert "src3" not in got                        # unlisted -> default 0.0
    assert 0 < got.get("src1", 0) < n["src1"]       # Bernoulli in between

    other = {r.doc_id for r in sp.stratified_sample(docs, "source", fr, salt="other").collect()}
    assert other != a  # independent draw under a different salt


def test_quota_sample_exact_n_per_stratum(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sizes = {r.source: r["count"] for r in docs.groupBy("source").count().collect()}
    n = 7
    out = sp.quota_sample(docs, "source", n).groupBy("source").count()
    got = {r.source: r["count"] for r in out.collect()}
    assert got == {s: min(n, c) for s, c in sizes.items()}
    # stable: re-running draws the identical subset
    a = {r.doc_id for r in sp.quota_sample(docs, "source", n).collect()}
    b = {r.doc_id for r in sp.quota_sample(docs, "source", n).collect()}
    assert a == b


def test_mixture_fractions_feasible_total(spark):
    """T = min(budget/weight); binding stratum fully consumed; strata
    outside the weights excluded."""
    import pytest

    from tg_reporting_etl_spark.functions import sampling as sp

    rows = (
        [(i, "a") for i in range(100)]
        + [(1000 + i, "b") for i in range(30)]
        + [(2000 + i, "c") for i in range(60)]
        + [(3000 + i, "junk") for i in range(40)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    fr = {
        r.source: (r.budget, r.fraction)
        for r in sp.mixture_fractions(df, "source", {"a": 0.5, "b": 0.3, "c": 0.2}).collect()
    }
    assert set(fr) == {"a", "b", "c"}
    assert fr["b"] == (30, 1.0)                      # binding stratum
    assert fr["a"][1] == pytest.approx(0.5)          # 0.5*100/100
    assert fr["c"][1] == pytest.approx(1 / 3)        # 0.2*100/60

    out = sp.mixture_sample(df, "source", {"a": 0.5, "b": 0.3, "c": 0.2})
    got = {r.source for r in out.collect()}
    assert "junk" not in got
    assert out.filter("source = 'b'").count() == 30  # fraction 1.0 keeps all


def test_temperature_flattens_toward_uniform(spark):
    """T=2 must shrink the relative spread of realized fractions vs the
    natural distribution, and the binding (smallest-after-flattening)
    stratum must be kept whole."""
    import pyspark.sql.functions as F

    from tg_reporting_etl_spark.functions import sampling as sp

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plan = {r.source: r for r in sp.temperature_plan(df, "source", 2.0).collect()}
    # natural ratio 9:1; sqrt-flattened weights ratio 3:1
    assert abs(plan["big"].weight / plan["small"].weight - 3.0) < 1e-6
    # small is binding: fraction 1.0; big keeps 3*100/900 = 1/3
    assert round(plan["small"].fraction, 6) == 1.0
    assert abs(plan["big"].fraction - 1 / 3) < 1e-6
    samp = sp.temperature_sample(df, "source", 2.0)
    by = {r.source: r.c for r in samp.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert by["small"] == 100  # binding stratum consumed whole
    assert 250 < by["big"] < 420  # Bernoulli around 300


def test_temperature_sample_deterministic_and_narrow(spark):
    import contextlib
    import io

    from tg_reporting_etl_spark.functions import sampling as sp

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r.doc_id for r in sp.temperature_sample(df, "source", 2.0).collect())
    b = sorted(r.doc_id for r in sp.temperature_sample(df.repartition(7), "source", 2.0).collect())
    assert a == b  # membership independent of partitioning
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sp.temperature_sample(df, "source", 2.0).explain("formatted")
    assert "SortMergeJoin" not in buf.getvalue()  # plan table broadcasts


def test_token_mixture_plan_rates_and_shortfall(spark):
    """Fixed token budget: undersubscribed source gets rate < 1 and zero
    shortfall; oversubscribed source pins rate at 1.0 and reports the
    exact token deficit; unweighted sources are excluded."""
    from tg_reporting_etl_spark.functions.sampling import token_mixture_plan

    rows = [
        # srcA: 3 docs x 4 tokens = 12 tokens
        *[(i, "a b c d", "srcA") for i in range(3)],
        # srcB: 2 docs x 2 tokens = 4 tokens
        *[(10 + i, "x y", "srcB") for i in range(2)],
        # srcC: unweighted, must not appear
        (20, "p q r", "srcC"),
        # NULL text drops from accounting
        (21, None, "srcA"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = {
        r.source: r
        for r in token_mixture_plan(
            docs, {"srcA": 0.25, "srcB": 0.75}, token_budget=20
        ).collect()
    }
    assert set(plan) == {"srcA", "srcB"}
    a, b = plan["srcA"], plan["srcB"]
    # srcA: avail 12, target floor(0.25*20)=5 -> rate 5/12, no shortfall
    assert (a.avail_tokens, a.target_tokens, a.shortfall_tokens) == (12, 5, 0)
    assert a.sampling_rate == round(5 / 12, 6)
    # srcB: avail 4, target floor(0.75*20)=15 -> rate 1.0, shortfall 11
    assert (b.avail_tokens, b.target_tokens, b.shortfall_tokens) == (4, 15, 11)
    assert b.sampling_rate == 1.0

    # a weighted source ABSENT from the corpus still reports: the
    # missing-source case is the maximal shortfall and must never be
    # the one case that emits no row
    plan2 = {
        r.source: r
        for r in token_mixture_plan(
            docs, {"srcA": 0.5, "srcGhost": 0.5}, token_budget=40
        ).collect()
    }
    g = plan2["srcGhost"]
    assert (g.avail_tokens, g.target_tokens, g.shortfall_tokens) == (0, 20, 20)
    assert g.sampling_rate == 1.0
