"""Duplicated-substring span detection (functions/spans.py): crafted
truth tables for window placement, interval merge, and the zero row;
cross-engine parity runs through the doc_dup_spans oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

from tg_reporting_etl_spark.functions import spans as sp


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stats(spark, rows, length):
    return {
        r.doc_id: r for r in sp.duplicated_span_stats(_docs(spark, rows), length).collect()
    }


def test_shared_substring_covered_both_sides(spark):
    # docs 1 and 2 share "ABCDEFGH" (len 8 >= L=4); doc 3 is disjoint
    rows = [(1, "xxABCDEFGHyy"), (2, "ABCDEFGHzzzz"), (3, "qqqqwwwwrrrr")]
    out = _stats(spark, rows, 4)
    # doc1: windows at 3..7 dup ("ABCD".."EFGH") -> covers chars 3..10 = 8
    assert (out[1].n_chars, out[1].covered_chars) == (12, 8)
    assert (out[2].n_chars, out[2].covered_chars) == (12, 8)
    assert (out[3].covered_chars, out[3].dup_span_fraction) == (0, 0.0)


def test_disjoint_islands_sum_not_merge(spark):
    # two shared 4-char substrings separated by unique middles
    rows = [(1, "AAAA-u1u1u1-BBBB"), (2, "AAAA=v2v2v2=BBBB")]
    out = _stats(spark, rows, 4)
    # islands [1,5) and [13,17): 4 + 4 covered, not one merged span
    assert out[1].covered_chars == 8
    assert out[2].covered_chars == 8


def test_overlapping_windows_merge(spark):
    # "ABCDE" shared: windows [1,5) and [2,6) merge to [1,6)
    rows = [(1, "ABCDExxxx"), (2, "yyyyABCDE")]
    out = _stats(spark, rows, 4)
    assert out[1].covered_chars == 5
    assert out[2].covered_chars == 5


def test_within_doc_repeat_not_counted(spark):
    # the gram repeats only WITHIN one doc -> df counts distinct docs,
    # so it is not a cross-document duplicate
    rows = [(1, "ABCDzzABCD"), (2, "unrelated!")]
    out = _stats(spark, rows, 4)
    assert out[1].covered_chars == 0


def test_short_and_null_docs_drop(spark):
    rows = [(1, "abc"), (2, None), (3, "long enough text")]
    out = _stats(spark, rows, 4)
    assert set(out) == {3}


def test_full_duplicate_fraction_one(spark):
    rows = [(1, "identical text body"), (2, "identical text body")]
    out = _stats(spark, rows, 4)
    assert out[1].dup_span_fraction == 1.0
    assert out[2].dup_span_fraction == 1.0


def test_dup_gram_join_broadcasts(spark):
    """The dup-gram join must carry NO explicit broadcast hint (an
    explicit hint overrides the size threshold and would OOM the driver
    on a corpus whose gram type space outgrows the budget) — yet AQE
    must still broadcast it at runtime when the table is small.  So:
    static plan hint-free and Cartesian-free; FINAL adaptive plan a
    broadcast join."""
    import contextlib
    import io

    df = sp.duplicated_span_stats(_docs(spark, [(1, "abcdefgh"), (2, "abcdefgh")]), 4)
    df.collect()  # materialize so AQE finalizes the plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "ResolvedHint" not in plan and "broadcast(" not in plan
    assert "AdaptiveSparkPlan" in plan
    assert "BroadcastHashJoin" in plan  # AQE's runtime choice, not a hint


def test_stride_is_a_subset_approximation(spark):
    """stride > 1 must never OVER-count: per doc, strided coverage is
    <= exact coverage, and stride=1 remains byte-identical to the
    original expression shape (the catalog/oracle path)."""
    rows = [
        (1, "xxABCDEFGHIJKLMNOPyy-unique-one-111"),
        (2, "zzABCDEFGHIJKLMNOPqq-unique-two-222"),
        (3, "totally unrelated body without reuse"),
    ]
    d = _docs(spark, rows)
    exact = {r.doc_id: r.covered_chars for r in sp.duplicated_span_stats(d, 8, 1).collect()}
    for s in (2, 3, 5):
        approx = {
            r.doc_id: r.covered_chars
            for r in sp.duplicated_span_stats(d, 8, s).collect()
        }
        assert set(approx) == set(exact)
        assert all(approx[k] <= exact[k] for k in exact), (s, approx, exact)
    # the shared 16-char run still detected at stride 3 (length >= 2s)
    approx3 = {r.doc_id: r.covered_chars for r in sp.duplicated_span_stats(d, 8, 3).collect()}
    assert approx3[1] > 0 and approx3[2] > 0


def test_stride_validates(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sp.char_gram_rows(_docs(spark, [(1, "abc")]), 4, 0)


def test_remove_duplicated_spans_vs_python_model(spark):
    """Removal surgery vs a direct python model: keeper doc (min
    doc_id) keeps its text; later docs lose merged duplicated islands,
    including spans at string start/end; docs shorter than L and
    dup-free docs come back unchanged."""
    from tg_reporting_etl_spark.functions.spans import remove_duplicated_spans

    L = 5
    rows = [
        (1, "QQQQQQQQQQzz"),        # keeper of the Q-run
        (2, "QQQQQQQQQQyy"),        # loses the Q island (string start)
        (3, "aabbQQQQQQQQQQ"),      # loses the Q island (string end)
        (4, "totally unique text"),  # dup-free
        (5, "tiny"),                # shorter than L
        (6, "xxQQQQQwwQQQQQpp"),    # two separate Q islands merge? (gap 'ww')
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # python model
    grams = {}
    for d, t in rows:
        if len(t) >= L:
            for i in range(len(t) - L + 1):
                grams.setdefault(t[i:i + L], []).append((d, i + 1))
    removable = {}
    for g, occ in grams.items():
        docs_of = {d for d, _ in occ}
        if len(docs_of) >= 2:
            keeper = min(docs_of)
            for d, i in occ:
                if d > keeper:
                    removable.setdefault(d, set()).add(i)
    expect = {}
    for d, t in rows:
        starts = sorted(removable.get(d, ()))
        keep = [True] * len(t)
        for i in starts:
            for j in range(i - 1, i - 1 + L):
                keep[j] = False
        expect[d] = "".join(c for c, k in zip(t, keep) if k)

    got = {r.doc_id: r.text_clean for r in remove_duplicated_spans(docs, L).collect()}
    assert got == expect
    rc = {r.doc_id: r.removed_chars for r in remove_duplicated_spans(docs, L).collect()}
    assert all(rc[d] == len(t) - len(expect[d]) for d, t in rows)


def test_remove_duplicated_spans_random_corpora_property(spark):
    """Randomized corpora over a 3-letter alphabet (dense cross-doc
    gram collisions) vs the python model — seeds fixed, 3 corpora."""
    import random

    from tg_reporting_etl_spark.functions.spans import remove_duplicated_spans

    L = 4
    for seed in (11, 23, 47):
        rng = random.Random(seed)
        rows = [
            (d, "".join(rng.choice("abc") for _ in range(rng.randint(2, 30))))
            for d in range(1, 13)
        ]
        grams = {}
        for d, t in rows:
            if len(t) >= L:
                for i in range(len(t) - L + 1):
                    grams.setdefault(t[i:i + L], []).append((d, i + 1))
        removable = {}
        for occ in grams.values():
            docs_of = {d for d, _ in occ}
            if len(docs_of) >= 2:
                keeper = min(docs_of)
                for d, i in occ:
                    if d > keeper:
                        removable.setdefault(d, set()).add(i)
        expect = {}
        for d, t in rows:
            keep = [True] * len(t)
            for i in removable.get(d, ()):
                for j in range(i - 1, i - 1 + L):
                    keep[j] = False
            expect[d] = "".join(c for c, k in zip(t, keep) if k)

        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r.text_clean
            for r in remove_duplicated_spans(docs, L).collect()
        }
        assert got == expect, f"seed {seed}"


def test_strided_removal_is_subset_of_exact(spark):
    """Strided surgery contract: every character a strided run removes,
    the exact (stride=1) run also removes — per doc, the removed char
    POSITIONS are a subset, not merely the counts.  Randomized 3-letter
    corpora (dense collisions), seeds fixed."""
    import random

    from tg_reporting_etl_spark.functions.spans import remove_duplicated_spans

    L, S = 4, 2

    for seed in (5, 17):
        rng = random.Random(seed)
        rows = [
            (d, "".join(rng.choice("abc") for _ in range(rng.randint(2, 30))))
            for d in range(1, 13)
        ]

        def model(stride):
            grams = {}
            for d, t in rows:
                if len(t) >= L:
                    for i in range(0, len(t) - L + 1, stride):
                        grams.setdefault(t[i:i + L], []).append((d, i + 1))
            removable = {}
            for occ in grams.values():
                docs_of = {d for d, _ in occ}
                if len(docs_of) >= 2:
                    keeper = min(docs_of)
                    for d, i in occ:
                        if d > keeper:
                            removable.setdefault(d, set()).add(i)
            cut = {}
            for d, t in rows:
                dead = set()
                for i in removable.get(d, ()):
                    dead.update(range(i - 1, i - 1 + L))
                cut[d] = dead
            return cut

        exact_cut, strided_cut = model(1), model(S)
        # model-level sanity: the subset property holds in the model
        for d in strided_cut:
            assert strided_cut[d] <= exact_cut[d], f"seed {seed} doc {d}"

        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r.text_clean
            for r in remove_duplicated_spans(docs, L, S).collect()
        }
        # engine matches the strided model exactly
        for d, t in rows:
            expect = "".join(c for i, c in enumerate(t) if i not in strided_cut[d])
            assert got[d] == expect, f"seed {seed} doc {d}"
        # and removes no more than the exact engine run
        exact_rc = {
            r.doc_id: r.removed_chars for r in remove_duplicated_spans(docs, L).collect()
        }
        strided_rc = {
            r.doc_id: r.removed_chars
            for r in remove_duplicated_spans(docs, L, S).collect()
        }
        assert all(strided_rc[d] <= exact_rc[d] for d in strided_rc), f"seed {seed}"
