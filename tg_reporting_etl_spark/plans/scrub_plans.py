"""Catalog rows for the scrubbing family (functions/scrub.py):
normalized dedup, PII census/redaction, overlap chunking.

DuckDB regex parity: patterns live in functions/scrub.py and are
written in the Java-regex/RE2 common subset; DuckDB ``regexp_replace``
takes the ``'g'`` flag because Spark's is always global.

PII fixture note: the synthetic corpus is PII-free by construction
(lowercase word soup — zero emails/digits), so the catalog query runs
:func:`scrub_pii` over ``text`` augmented with a DETERMINISTIC per-doc
PII suffix built from ``doc_id`` (one email, one IPv4, one phone).
Both engines build the identical suffix, so the oracle exercises the
full detect/redact/digest path with non-degenerate counts; the
un-augmented operator behavior (zero-count pass-through, crafted true
positives/negatives, NULL contract) is pinned in tests/test_scrub.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions import scrub as sc
from tg_reporting_etl_spark.plans.catalog import register
from tg_reporting_etl_spark.sources.readers import load_table

CHUNK_SIZE, CHUNK_STRIDE = 120, 90


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "doc_normalized_dedup",
    """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS norm_digest,
       min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY 1""",
    survey_ids="LLM: normalized-text exact dedup",
)
def q_doc_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sc.normalized_dedup(_docs(spark, sf_dir))


def _pii_suffix_sql() -> str:
    return (
        "' user' || CAST(doc_id AS VARCHAR) || '@example.com"
        " 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR)"
        " || ' 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
        " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )


def _pii_suffix_col() -> Column:
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.lit(" user"), did, F.lit("@example.com 10."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"), F.lit(" 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )


@register(
    "doc_pii_scrub",
    f"""WITH pii AS (
  SELECT doc_id, text || {_pii_suffix_sql()} AS t FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{sc.EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{sc.IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t, '{sc.PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(s) AS scrubbed_digest,
       CAST(length(s) AS BIGINT) AS scrubbed_len
FROM (
  SELECT doc_id, t,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{sc.EMAIL_RE}', '<EMAIL>', 'g'),
             '{sc.IPV4_RE}', '<IP>', 'g'),
           '{sc.PHONE_RE}', '<PHONE>', 'g') AS s
  FROM pii
)""",
    survey_ids="LLM: PII census + redaction",
)
def q_doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    augmented = _docs(spark, sf_dir).withColumn(
        "pii_text", F.concat(F.col("text"), _pii_suffix_col())
    )
    return sc.scrub_pii(augmented, text_col="pii_text")


SPAN_L = 20


def _span_oracle() -> str:
    ln = SPAN_L
    return f"""WITH grams AS (
  SELECT doc_id, i,
         CAST(('0x' || substr(md5(substr(text, i, {ln})), 1, 15)) AS BIGINT) AS h
  FROM documents, unnest(generate_series(1, length(text) - {ln - 1})) t(i)
  WHERE length(text) >= {ln}
),
dup AS (SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
pos AS (SELECT g.doc_id, g.i FROM grams g JOIN dup USING (h)),
flagged AS (
  SELECT doc_id, i,
         CASE WHEN i > COALESCE(MAX(i + {ln}) OVER (
                PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              THEN 1 ELSE 0 END AS new_island
  FROM pos
),
isl AS (
  SELECT doc_id, i,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
cov AS (
  SELECT doc_id, CAST(SUM(span_len) AS BIGINT) AS covered_chars
  FROM (SELECT doc_id, island, MAX(i) + {ln} - MIN(i) AS span_len FROM isl GROUP BY 1, 2)
  GROUP BY 1
)
SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       COALESCE(c.covered_chars, 0) AS covered_chars,
       ROUND(COALESCE(c.covered_chars, 0) * 1.0 / length(d.text), 6) AS dup_span_fraction
FROM documents d LEFT JOIN cov c USING (doc_id)
WHERE length(d.text) >= {ln}"""


@register(
    "doc_dup_spans",
    _span_oracle(),
    survey_ids="LLM: exact duplicated-substring span coverage (substring dedup signal)",
)
def q_doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tg_reporting_etl_spark.functions import spans as sp

    return sp.duplicated_span_stats(_docs(spark, sf_dir), SPAN_L)


SPAN_STRIDE = 3


def _span_strided_oracle() -> str:
    ln, st = SPAN_L, SPAN_STRIDE
    return f"""WITH grams AS (
  SELECT doc_id, i,
         CAST(('0x' || substr(md5(substr(text, i, {ln})), 1, 15)) AS BIGINT) AS h
  FROM documents, unnest(generate_series(1, length(text) - {ln - 1}, {st})) t(i)
  WHERE length(text) >= {ln}
),
dup AS (SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
pos AS (SELECT g.doc_id, g.i FROM grams g JOIN dup USING (h)),
flagged AS (
  SELECT doc_id, i,
         CASE WHEN i > COALESCE(MAX(i + {ln}) OVER (
                PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              THEN 1 ELSE 0 END AS new_island
  FROM pos
),
isl AS (
  SELECT doc_id, i,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
cov AS (
  SELECT doc_id, CAST(SUM(span_len) AS BIGINT) AS covered_chars
  FROM (SELECT doc_id, island, MAX(i) + {ln} - MIN(i) AS span_len FROM isl GROUP BY 1, 2)
  GROUP BY 1
)
SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       COALESCE(c.covered_chars, 0) AS covered_chars,
       ROUND(COALESCE(c.covered_chars, 0) * 1.0 / length(d.text), 6) AS dup_span_fraction
FROM documents d LEFT JOIN cov c USING (doc_id)
WHERE length(d.text) >= {ln}"""


@register(
    "doc_dup_spans_strided",
    _span_strided_oracle(),
    survey_ids="LLM: duplicated-substring spans, strided scale path (rows/stride, subset coverage)",
)
def q_doc_dup_spans_strided(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stride-3 scale path of doc_dup_spans: gram rows divided by
    the stride, coverage a proven subset of the exact query's (see
    tests/test_spans.py) — here oracle-checked cross-engine at the
    sampled positions, so the approximation itself is deterministic
    and verified, not just bounded."""
    from tg_reporting_etl_spark.functions import spans as sp

    return sp.duplicated_span_stats(_docs(spark, sf_dir), SPAN_L, SPAN_STRIDE)


@register(
    "doc_chunk_overlap",
    f"""SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT) AS start_pos,
       CAST(length(substr(text, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})) AS BIGINT) AS chunk_len,
       md5(substr(text, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})) AS chunk_digest
FROM documents, unnest(generate_series(0,
     CAST(ceil(greatest(length(text) - {CHUNK_SIZE}, 0) / {CHUNK_STRIDE}.0) AS BIGINT))) t(i)""",
    survey_ids="LLM: fixed-size overlap chunking (RAG prep)",
)
def q_doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sc.chunk_documents(_docs(spark, sf_dir), CHUNK_SIZE, CHUNK_STRIDE)


def _span_removal_oracle(stride: int = 1) -> str:
    ln = SPAN_L
    return f"""WITH grams AS (
  SELECT doc_id, i,
         CAST(('0x' || substr(md5(substr(text, i, {ln})), 1, 15)) AS BIGINT) AS h
  FROM documents, unnest(generate_series(1, length(text) - {ln - 1}, {stride})) t(i)
  WHERE length(text) >= {ln}
),
dup AS (SELECT h, MIN(doc_id) AS keeper FROM grams GROUP BY h
        HAVING count(DISTINCT doc_id) >= 2),
pos AS (SELECT g.doc_id, g.i FROM grams g JOIN dup d USING (h)
        WHERE g.doc_id > d.keeper),
flagged AS (
  SELECT doc_id, i,
         CASE WHEN i > COALESCE(MAX(i + {ln}) OVER (
                PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              THEN 1 ELSE 0 END AS new_island
  FROM pos
),
isl AS (
  SELECT doc_id, i,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
isls AS (SELECT doc_id, island, MIN(i) AS start, MAX(i) + {ln} AS fin
         FROM isl GROUP BY 1, 2),
gaps AS (
  SELECT doc_id, start, fin,
         COALESCE(LAG(fin) OVER (PARTITION BY doc_id ORDER BY start), 1) AS gap_start
  FROM isls
),
pieces AS (
  SELECT g.doc_id,
         string_agg(substr(d.text, CAST(g.gap_start AS INT),
                           CAST(g.start - g.gap_start AS INT)), '' ORDER BY g.start) AS head,
         CAST(MAX(g.fin) AS INT) AS last_end
  FROM gaps g JOIN documents d USING (doc_id)
  GROUP BY 1
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(clean) AS BIGINT) AS n_chars_clean,
       CAST(length(text) - length(clean) AS BIGINT) AS removed_chars,
       clean AS text_clean
FROM (
  SELECT d.doc_id, d.text,
         COALESCE(p.head || substr(d.text, p.last_end,
                                   GREATEST(length(d.text) - p.last_end + 1, 0)),
                  d.text) AS clean
  FROM documents d LEFT JOIN pieces p USING (doc_id)
  WHERE d.text IS NOT NULL
)"""


@register(
    "doc_remove_dup_spans",
    _span_removal_oracle(),
    survey_ids="LLM: substring-dedup removal surgery (Lee et al.), keeper doc preserved",
)
def q_doc_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """functions/spans.py:remove_duplicated_spans — cut every
    cross-document duplicated span out of all docs except the gram's
    earliest (min doc_id) document; the oracle performs the same
    surgery with SQL window gaps + ordered string_agg, so the full
    cleaned TEXT hash-matches, not just the counts."""
    from tg_reporting_etl_spark.functions import spans as sp

    return sp.remove_duplicated_spans(_docs(spark, sf_dir), SPAN_L)


@register(
    "doc_remove_dup_spans_strided",
    _span_removal_oracle(SPAN_STRIDE),
    survey_ids="LLM: substring-dedup removal, strided scale path (subset of exact removal)",
)
def q_doc_remove_dup_spans_strided(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stride-3 scale path of doc_remove_dup_spans — gram rows (the
    dominant 100 TB cost) divided by the stride; every removed
    character is also removed by the exact run (subset contract pinned
    in tests/test_spans.py).  The oracle performs the identical strided
    surgery, so the approximation is deterministic and cross-engine
    verified, not just bounded."""
    from tg_reporting_etl_spark.functions import spans as sp

    return sp.remove_duplicated_spans(_docs(spark, sf_dir), SPAN_L, SPAN_STRIDE)
