"""Distributed Bloom filter as plain DataFrame bit arithmetic.

Spark 4 exposes no user-facing bloom functions (``bloom_filter_agg`` /
``might_contain`` are internal to runtime row-level filtering, and
``DataFrameStatFunctions.bloomFilter`` is gone), so this builds one
from column expressions: k md5-salted bit positions per key, OR-folded
into a sparse (word_idx, word) table of 32-bit words.

Why 32-bit words in a 64-bit column: ``1 << 63`` trips signed-overflow
differences between engines; capping the shift at 31 keeps every mask
positive and byte-identical in Spark and DuckDB, at the cost of 2x the
(tiny) word-table row count.

Scale contract: the built filter is O(m_bits/32) rows REGARDLESS of key
count — a 1e9-key filter at 10 bits/key is ~40 MB of words, broadcast-
joinable, where the exact digest set would be 16 GB and force a shuffle
on every probe.  Probe cost is k narrow rows per input row joined
against the broadcast words, then a bool_and roll-up keyed on the
probe's own id — no shuffle of the corpus body.  False-positive rate is
the classic (1 - e^(-kn/m))^k; false negatives are structurally
impossible (tests pin both).

md5-based positions (not xxhash64) so DuckDB computes the identical
filter — the whole build+probe is oracle-checkable, unusual for an
"approximate" structure: the approximation is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions.dedup import h32

#: default salt family (k = len(SALTS) hash functions)
BLOOM_SALTS = ("b0", "b1", "b2", "b3")
#: default filter width in bits; 4096 32-bit words, always broadcastable
DEFAULT_M_BITS = 1 << 17


def _positions(key: Column, m_bits: int, salts: tuple[str, ...]) -> list[Column]:
    return [h32(F.concat(F.lit(f"bloom|{s}|"), key)) % m_bits for s in salts]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    salts: tuple[str, ...] = BLOOM_SALTS,
) -> DataFrame:
    """Sparse bloom words (word_idx, word) for the distinct keys.

    One explode (factor k) + one bounded groupBy on word_idx — output
    rows <= m_bits/32 whatever the key count."""
    pos = keys.select(F.explode(F.array(*_positions(F.col(key_col), m_bits, salts))).alias("p"))
    return pos.groupBy(F.expr("p div 32").alias("word_idx")).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(p % 32 as int))")).alias("word")
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    id_col: str,
    words: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    salts: tuple[str, ...] = BLOOM_SALTS,
) -> DataFrame:
    """(id_col, bloom_hit): true iff ALL k bits for the key are set.

    The words side broadcasts (it is bounded by m_bits); a missing word
    row means those 32 bits are all zero, i.e. a definite miss."""
    probe = df.select(
        F.col(id_col),
        F.explode(F.array(*_positions(F.col(key_col), m_bits, salts))).alias("p"),
    )
    joined = probe.join(F.broadcast(words), F.expr("p div 32") == words["word_idx"], "left")
    hit = (words["word"].isNotNull()) & (
        F.expr("word & shiftleft(1L, cast(p % 32 as int))") != 0
    )
    return joined.groupBy(id_col).agg(F.bool_and(hit).alias("bloom_hit"))


def bloom_oracle_sql(
    eval_rel: str,
    probe_rel: str,
    key_expr: str,
    id_expr: str,
    id_alias: str = "doc_id",
    m_bits: int = DEFAULT_M_BITS,
    salts: tuple[str, ...] = BLOOM_SALTS,
) -> str:
    """DuckDB twin of build+probe: identical salts, positions, words,
    and hit predicate, so the 'approximate' result is bit-exact across
    engines.  ``eval_rel``/``probe_rel`` are FROM-clause fragments."""
    vals = ", ".join(f"('{s}')" for s in salts)
    pos = "CAST(('0x' || substr(md5('bloom|' || s.salt || '|' || {k}), 1, 8)) AS BIGINT) % {m}"
    return f"""WITH pos AS (
  SELECT {pos.format(k=key_expr, m=m_bits)} AS p
  FROM {eval_rel} CROSS JOIN (VALUES {vals}) s(salt)
),
words AS (
  SELECT p // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS word
  FROM pos GROUP BY 1
),
probe AS (
  SELECT {id_expr} AS pid,
         {pos.format(k=key_expr, m=m_bits)} AS p
  FROM {probe_rel} CROSS JOIN (VALUES {vals}) s(salt)
)
SELECT pid AS {id_alias},
       bool_and(w.word IS NOT NULL
                AND (w.word & (CAST(1 AS BIGINT) << CAST(pr.p % 32 AS INTEGER))) <> 0)
         AS bloom_hit
FROM probe pr LEFT JOIN words w ON w.word_idx = pr.p // 32
GROUP BY 1"""
