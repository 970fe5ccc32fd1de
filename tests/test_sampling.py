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
