"""Scrub family: normalized dedup, PII census/redaction, overlap
chunking (functions/scrub.py).  Crafted-row truth tables here; the
cross-engine value parity runs through the catalog oracles
(plans/scrub_plans.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.functions import scrub as sc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- normalization

def test_normalize_collapses_case_punct_whitespace(spark):
    d = _docs(
        spark,
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "HELLO---WORLD"),
            (4, "different text"),
        ],
    )
    out = sc.normalized_dedup(d).orderBy("keep_doc_id").collect()
    assert [(r.keep_doc_id, r.n_copies) for r in out] == [(1, 3), (4, 1)]


def test_normalized_dedup_drops_null_text(spark):
    d = _docs(spark, [(1, "x"), (2, None)])
    out = sc.normalized_dedup(d).collect()
    assert len(out) == 1 and out[0].keep_doc_id == 1


def test_normalize_keeps_digits(spark):
    d = spark.range(1).select(sc.normalize_text(F.lit("Port 8080: OK!")).alias("t"))
    assert out_one(d) == "port 8080 ok"


def out_one(df):
    return df.collect()[0][0]


# --------------------------------------------------------------------- PII

PII_ROWS = [
    (1, "mail me at alice.smith+x@corp.example.org today"),
    (2, "server at 10.0.255.7 rebooted"),
    (3, "call 555-867-5309 or 555 867 5309"),
    (4, "no pii here at all"),
    (5, "version 1.2.3.4.5 is not an ip, nor is 1234.5.6.7"),
    (6, None),
]


def test_pii_counts(spark):
    out = {r.doc_id: r for r in sc.scrub_pii(_docs(spark, PII_ROWS)).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # NULL text drops (family contract)
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (1, 0, 0)
    assert (out[2].n_emails, out[2].n_ips, out[2].n_phones) == (0, 1, 0)
    assert (out[3].n_emails, out[3].n_ips, out[3].n_phones) == (0, 0, 2)
    assert (out[4].n_emails, out[4].n_ips, out[4].n_phones) == (0, 0, 0)


def test_pii_negative_lookalikes(spark):
    """Dotted version strings and 4-digit-octet lookalikes must not
    count as IPs — \\b plus the 1-3 digit octet bound rejects both
    ("1.2.3.4" inside "1.2.3.4.5" fails the trailing boundary when
    followed by '.'? No: '.' is a non-word char, so the boundary
    holds — the first 4 octets DO match, by design: a conservative
    scrubber over-redacts dotted quads rather than leaking them)."""
    out = {r.doc_id: r for r in sc.scrub_pii(_docs(spark, PII_ROWS)).collect()}
    # "1.2.3.4.5": "1.2.3.4" matches (over-redaction accepted);
    # "1234.5.6.7" cannot match (first octet is 4 digits, \b\d{1,3}\.
    # fails at every alignment).
    assert out[5].n_ips == 1


def test_pii_redaction_and_passthrough(spark):
    d = _docs(spark, PII_ROWS)
    scrubbed = {
        r.doc_id: r.s
        for r in d.filter(F.col("text").isNotNull())
        .select("doc_id", sc.scrubbed_text(F.col("text")).alias("s"))
        .collect()
    }
    assert scrubbed[1] == "mail me at <EMAIL> today"
    assert scrubbed[2] == "server at <IP> rebooted"
    assert scrubbed[3] == "call <PHONE> or <PHONE>"
    assert scrubbed[4] == "no pii here at all"  # clean text is byte-identical


def test_pii_census_digest_matches_scrubbed_body(spark):
    d = _docs(spark, PII_ROWS)
    joined = (
        sc.scrub_pii(d)
        .join(
            d.filter(F.col("text").isNotNull()).select(
                "doc_id", F.md5(sc.scrubbed_text(F.col("text"))).alias("want")
            ),
            "doc_id",
        )
        .filter(F.col("scrubbed_digest") != F.col("want"))
    )
    assert joined.count() == 0


# ------------------------------------------------------------------ chunking

def test_chunk_single_when_short(spark):
    d = _docs(spark, [(1, "short text")])
    out = sc.chunk_documents(d, chunk_size=120, stride=90).collect()
    assert len(out) == 1
    assert (out[0].chunk_idx, out[0].start_pos, out[0].chunk_len) == (0, 1, 10)


def test_chunk_cover_and_overlap(spark):
    text = "abcdefghij" * 5  # 50 chars
    d = _docs(spark, [(1, text)])
    rows = sorted(
        sc.chunk_documents(d, chunk_size=20, stride=15).collect(),
        key=lambda r: r.chunk_idx,
    )
    # n = 1 + ceil((50-20)/15) = 3; starts 1, 16, 31
    assert [r.start_pos for r in rows] == [1, 16, 31]
    # every char covered: last chunk reaches the end
    assert rows[-1].start_pos - 1 + rows[-1].chunk_len == 50
    # consecutive chunks overlap by chunk_size - stride = 5
    for a, b in zip(rows, rows[1:]):
        assert a.start_pos + 20 - b.start_pos == 5
    # digests match direct substrings
    for r in rows:
        import hashlib

        want = hashlib.md5(text[r.start_pos - 1 : r.start_pos - 1 + 20].encode()).hexdigest()
        assert r.chunk_digest == want


def test_chunk_exact_boundary(spark):
    # len - chunk_size divisible by stride: no phantom empty chunk
    d = _docs(spark, [(1, "x" * 210)])
    rows = sc.chunk_documents(d, chunk_size=120, stride=90).collect()
    assert sorted(r.start_pos for r in rows) == [1, 91]


def test_chunk_validates_params(spark):
    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        sc.chunk_documents(d, chunk_size=10, stride=20)
    with pytest.raises(ValueError):
        sc.chunk_documents(d, chunk_size=0, stride=0)


def test_chunk_is_shuffle_free(spark):
    """The chunker must stay a narrow map over the scan — an Exchange
    here would reshuffle the full corpus body at 100 TB."""
    import contextlib
    import io

    d = _docs(spark, [(1, "x" * 300)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sc.chunk_documents(d).explain("formatted")
    assert "Exchange" not in buf.getvalue()
