"""Corpus scrubbing operators: text normalization for dedup keys, PII
detection/redaction, and fixed-size overlap chunking.

All pure column expressions (JVM-side, whole-stage codegen) — the only
shuffle any of these introduce is the digest groupBy in
:func:`normalized_dedup`; PII scrubbing and chunking are narrow maps, so
a 100 TB corpus pays one scan and no exchange.

Regex portability contract: every pattern below is written in the
common subset of Java regex (Spark) and RE2 (DuckDB) — character
classes, bounded repetition, ``\\b`` word boundaries; no lookaround, no
backreferences — so the engine and the oracle compile the exact same
automaton.  DuckDB's ``regexp_replace`` defaults to first-match-only;
its oracles must pass the ``'g'`` flag to mirror Spark's always-global
``regexp_replace``.

Reference scope note: the reference engine (pandas+SQL reporting ETL)
has no text-scrubbing surface; these belong to the LLM-data layer
(SURVEY §2.13) sized for training-corpus preparation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Detection patterns.  Kept deliberately simple (the operator shape —
# count, redact, digest — is the engine's contract; a production
# deployment swaps in its compliance team's pattern pack).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

# Redaction must run email -> ip -> phone: the email pattern can contain
# digit runs a later pass must not re-match, and the ip pattern's
# dotted digit groups must be gone before the phone pass (its separator
# class includes '.').
_REDACTIONS = [(EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")]


def normalize_text(text: Column) -> Column:
    """Canonical dedup key: lowercase, every non-alphanumeric run -> one
    space, trimmed.  Catches the trivial variants (case, punctuation,
    whitespace) that byte-exact dedup misses while staying a pure
    expression — the aggressive end of the C4/CCNet normalization
    ladder, before near-dup methods take over."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


def normalized_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup over the NORMALIZED text: (norm_digest, keep_doc_id,
    n_copies).  Same scale posture as exact_dedup — the shuffle key is
    the 16-byte digest, never the document body; NULL text drops (text
    family contract)."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select("doc_id", F.md5(normalize_text(F.col(text_col))).alias("norm_digest"))
        .groupBy("norm_digest")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII census + redaction.

    Output: (doc_id, n_emails, n_ips, n_phones, scrubbed digest +
    length).  Counts are taken on the raw text; redaction rewrites each
    class to a typed placeholder in the fixed order documented at
    ``_REDACTIONS``.  The scrubbed text itself is carried as an md5
    digest plus length — callers that need the body apply
    :func:`scrubbed_text` to their own projection; the census query
    stays narrow.  NULL text drops (text family contract)."""
    d = docs.filter(F.col(text_col).isNotNull())
    t = F.col(text_col)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), 0)).cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.md5(scrubbed_text(t)).alias("scrubbed_digest"),
        F.length(scrubbed_text(t)).cast("long").alias("scrubbed_len"),
    )


def scrubbed_text(text: Column) -> Column:
    """The redacted body: every PII class replaced by its placeholder,
    in the fixed ``_REDACTIONS`` order."""
    out = text
    for pat, token in _REDACTIONS:
        out = F.regexp_replace(out, pat, token)
    return out


def chunk_documents(
    docs: DataFrame, chunk_size: int = 120, stride: int = 90, text_col: str = "text"
) -> DataFrame:
    """Fixed-size character chunks with overlap (RAG/window-attention
    prep): chunk ``i`` covers ``[1 + i*stride, 1 + i*stride + chunk_size)``
    1-based, and the last chunk is the first one whose window reaches the
    end of the text (so every character lands in >= 1 chunk and
    consecutive chunks overlap by ``chunk_size - stride``).

    Chunk count per doc is ``1 + ceil(max(len - chunk_size, 0) /
    stride)`` — bounded fan-out, pure sequence+explode, no shuffle, no
    Python.  Docs at or under ``chunk_size`` chars yield exactly one
    chunk.  NULL text drops (text family contract).

    Output: (doc_id, chunk_idx, start_pos, chunk_len, chunk_digest).
    """
    if stride <= 0 or chunk_size <= 0 or stride > chunk_size:
        raise ValueError("require 0 < stride <= chunk_size")
    d = docs.filter(F.col(text_col).isNotNull())
    ln = F.length(F.col(text_col))
    n_extra = F.ceil(F.greatest(ln - chunk_size, F.lit(0)) / F.lit(stride)).cast("int")
    chunk = F.substring(F.col(text_col), F.col("start_pos").cast("int"), chunk_size)
    return (
        d.select("doc_id", text_col, F.posexplode(F.sequence(F.lit(0), n_extra)))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("chunk_idx"),
            (F.col("col").cast("long") * stride + 1).alias("start_pos"),
            F.col(text_col),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "start_pos",
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_digest"),
        )
    )
