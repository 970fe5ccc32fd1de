"""Bloom filter (functions/bloom.py): structural no-false-negatives,
bounded false-positive rate, broadcast probe plan, and word-table size
contract.  Cross-engine bit-exactness runs through the catalog oracle
(doc_bloom_decontaminate)."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from tg_reporting_etl_spark.functions import bloom as bl

M_BITS = 1 << 14  # small filter so the FPR test has teeth


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.concat(F.lit("k"), F.col("id")).alias("k"))


def test_no_false_negatives(spark):
    members = _keys(spark, 0, 2000)
    words = bl.bloom_build(members, "k", m_bits=M_BITS)
    out = bl.bloom_might_contain(
        members.withColumn("id", F.col("k")), "k", "id", words, m_bits=M_BITS
    )
    assert out.filter(~F.col("bloom_hit")).count() == 0


def test_fpr_within_theory(spark):
    n, k = 2000, len(bl.BLOOM_SALTS)
    words = bl.bloom_build(_keys(spark, 0, n), "k", m_bits=M_BITS)
    non_members = _keys(spark, 10_000, 20_000).withColumn("id", F.col("k"))
    hits = (
        bl.bloom_might_contain(non_members, "k", "id", words, m_bits=M_BITS)
        .filter("bloom_hit")
        .count()
    )
    import math

    theory = (1 - math.exp(-k * n / M_BITS)) ** k  # ~0.028 here
    assert hits / 10_000 <= 3 * theory, f"fpr {hits / 10_000} vs theory {theory}"
    # and the filter is not degenerate-full: some probes must miss
    assert hits < 10_000


def test_word_table_bounded_by_m_not_n(spark):
    words = bl.bloom_build(_keys(spark, 0, 50_000), "k", m_bits=M_BITS)
    assert words.count() <= M_BITS // 32


def test_probe_plan_broadcasts_words(spark):
    words = bl.bloom_build(_keys(spark, 0, 100), "k", m_bits=M_BITS)
    out = bl.bloom_might_contain(
        _keys(spark, 0, 100).withColumn("id", F.col("k")), "k", "id", words, m_bits=M_BITS
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_matches_exact_membership_semantics(spark):
    """bloom_hit ⊇ exact membership; on a sparse filter the overlap is
    exactly the true member set for this fixture (FPR ~3e-5 at
    m=2^17)."""
    members = _keys(spark, 0, 500)
    words = bl.bloom_build(members, "k")  # default wide m
    probe = _keys(spark, 250, 1000).withColumn("id", F.col("k"))
    got = {
        r.id
        for r in bl.bloom_might_contain(probe, "k", "id", words).filter("bloom_hit").collect()
    }
    want = {f"k{i}" for i in range(250, 500)}
    assert got == want
