"""Exact duplicated-substring span detection (the substring-dedup
signal of Lee et al., "Deduplicating Training Data Makes Language
Models Better"): for every document, the fraction of characters
covered by some length-``L`` substring that also appears in ANOTHER
document.

Spark-first shape (no suffix arrays, no Python):

1. gram rows — every length-``L`` character window, keyed by a 60-bit
   md5 prefix hash (15 hex chars: fits a signed BIGINT in both engines,
   collision odds ~n²/2^61 — negligible at any realistic gram-type
   count, and engine-portable where xxhash64 is not);
2. cross-document gram table — groupBy hash with a distinct-doc count,
   kept only where df >= 2.  Bounded by the gram TYPE space, so it
   broadcasts; a corpus whose type space outgrows the threshold
   degrades to a sort-merge join (correct, one extra shuffle);
3. duplicated positions join back, then a classic gaps-and-islands
   interval merge per document: position windows [i, i+L) sorted by i,
   a new island starts where i breaks past the running max end, and
   each island contributes (max i) + L - (min i) covered chars;
4. one left join back to the documents so dup-free docs report 0.0
   rather than vanishing.

The per-doc window (partition by doc_id order by i) is the only
row-count-scale shuffle beyond the gram df agg — both are keyed on
bounded-size columns (8-byte hash / doc id + int), never the text.

At 100 TB the honest caveat: char-level gram rows are ~len(text) rows
per doc.  That is the same cost class the shingle family already pays
(dedup.py), and the standard production refinement — stride the gram
start positions and round island boundaries outward — divides the row
count by the stride at the cost of span-boundary resolution; the
interval-merge machinery here is unchanged under that refinement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions.fanout import fan_out
from tg_reporting_etl_spark.functions.persist import tracked_persist

DEFAULT_SPAN_L = 20


def h60(col: Column) -> Column:
    """First 15 md5 hex chars as a non-negative 60-bit BIGINT —
    portable (DuckDB: CAST('0x'||substr(md5(x),1,15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def char_gram_rows(
    docs: DataFrame, length: int = DEFAULT_SPAN_L, stride: int = 1
) -> DataFrame:
    """(doc_id, i, h): the length-``length`` char window at every
    ``stride``-th start position (1-based) and its 60-bit hash.  Docs
    shorter than ``length`` yield no rows; NULL text drops (text
    family contract).

    ``stride=1`` is exact; ``stride=s>1`` divides the row count by
    ``s`` at the cost of span resolution — a duplicated region is
    detected only if it covers a sampled start, so reported coverage
    is a SUBSET of the exact coverage (never an overcount; pinned in
    tests).  The standard production setting pairs ``s`` with
    ``length >= 2s`` so any duplicated run of ``length + s - 1`` chars
    still hits a sampled start."""
    if stride < 1:
        raise ValueError("stride must be >= 1")
    t = F.col("text")
    # the window hash is CPU-bound (one md5 per sampled start) and text
    # compresses ~50x in parquet, so a compact scan would serialize it;
    # fan out first (scan-split arithmetic, no RDD conversion — no-op
    # when the scan is already wide, i.e. always at cluster scale)
    docs = fan_out(docs)
    return (
        docs.filter(t.isNotNull() & (F.length(t) >= length))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length(t) - length + 1, F.lit(stride))
            ).alias("i"),
            t.alias("_t"),
        )
        .select(
            "doc_id",
            "i",
            h60(F.col("_t").substr(F.col("i").cast("int"), F.lit(length))).alias("h"),
        )
    )


def merge_islands(pos: DataFrame, length: int) -> DataFrame:
    """Gaps-and-islands merge of (doc_id, i) window starts into maximal
    disjoint spans: (doc_id, island, start, fin) with fin exclusive.

    Two projections: a window expression may not nest inside another
    window aggregate (both engines), so island starts are flagged
    first, then cumulative-summed into island ids."""
    w = Window.partitionBy("doc_id").orderBy("i")
    prev_end = F.max(F.col("i") + length).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = pos.withColumn(
        "new_island",
        F.when(F.col("i") > F.coalesce(prev_end, F.lit(0)), 1).otherwise(0),
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w))
    return islands.groupBy("doc_id", "island").agg(
        F.min("i").alias("start"), (F.max("i") + length).alias("fin")
    )


def duplicated_span_stats(
    docs: DataFrame, length: int = DEFAULT_SPAN_L, stride: int = 1
) -> DataFrame:
    """(doc_id, n_chars, covered_chars, dup_span_fraction) for every
    doc with >= ``length`` chars: covered_chars = size of the union of
    all sampled windows whose gram occurs in >= 2 distinct documents
    (``stride`` > 1 under-approximates — see :func:`char_gram_rows`)."""
    # persisted: the gram explode is the expensive pass and both the df
    # table and the position join read it (24 bytes/row, no strings)
    grams = tracked_persist(char_gram_rows(docs, length, stride))
    dup_grams = (
        grams.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("h")
    )
    # No explicit broadcast hint: an explicit F.broadcast overrides
    # Spark's size threshold, so on a corpus whose duplicated-gram type
    # space outgrows the broadcast budget it would OOM the driver
    # instead of degrading.  Left to AQE, the join broadcasts when the
    # dup-gram table is small (the common case — it is already an
    # aggregated, deduplicated 8-byte-key table) and falls back to a
    # shuffled hash/sort-merge join when it is not.
    pos = grams.join(dup_grams, "h").select("doc_id", "i")

    covered = (
        merge_islands(pos, length)
        .groupBy("doc_id")
        .agg(F.sum(F.col("fin") - F.col("start")).cast("long").alias("covered_chars"))
    )
    base = docs.filter(
        F.col("text").isNotNull() & (F.length("text") >= length)
    ).select("doc_id", F.length("text").cast("long").alias("n_chars"))
    return (
        base.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("covered_chars", F.lit(0)).cast("long").alias("covered_chars"),
            F.round(F.coalesce("covered_chars", F.lit(0)) / F.col("n_chars"), 6).alias(
                "dup_span_fraction"
            ),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame, length: int = DEFAULT_SPAN_L, stride: int = 1
) -> DataFrame:
    """Substring-dedup REMOVAL (the surgery behind the Lee et al.
    signal :func:`duplicated_span_stats` only measures): cut every
    cross-document duplicated span out of all documents EXCEPT the
    gram's earliest document (min doc_id — one copy of the content
    survives, deterministically).

    Returns every non-NULL-text doc:
    (doc_id, n_chars, n_chars_clean, removed_chars, text_clean).

    ``stride=1`` is exact.  ``stride=s>1`` is the 100 TB refinement the
    stats operator already carries (:func:`char_gram_rows`): gram rows
    (the dominant cost — ~len(text) rows per doc at stride 1) divide by
    ``s``, and the removal becomes a SUBSET-approximation — a gram is
    seen only at sampled starts, so (a) detected islands cover a subset
    of the exact islands' characters, and (b) the per-gram keeper is
    min-doc over SAMPLED occurrences (>= the exact keeper), which only
    ever EXEMPTS more docs from surgery.  Every character a strided run
    removes, the exact run also removes (pinned by
    test_strided_removal_is_subset_of_exact); pair ``s`` with
    ``length >= 2s`` so any duplicated run of ``length + s - 1`` chars
    still hits a sampled start.

    Plan shape: the gram pass and island merge are exactly the stats
    operator's (persisted gram rows; bounded dup-gram table with a
    per-gram min-doc aggregate; the per-doc position window).  The
    splice is ROW-LOCAL: islands collect into a per-doc sorted int
    array (bounded by island count, no strings), one doc_id join
    attaches the text, and a single ``aggregate`` fold rebuilds the
    kept segments in place — document bodies never ride a shuffle.
    """
    grams = tracked_persist(char_gram_rows(docs, length, stride))
    dup = (
        grams.groupBy("h")
        .agg(
            F.count_distinct("doc_id").alias("ndocs"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("ndocs") >= 2)
        .select("h", "keeper")
    )
    # removable occurrences: every window of a duplicated gram OUTSIDE
    # its keeper document (within-doc repeats inside the keeper are
    # repetition_stats' concern, not cross-doc dedup's)
    pos = grams.join(dup, "h").filter(F.col("doc_id") > F.col("keeper")).select("doc_id", "i")
    spans_arr = (
        merge_islands(pos, length)
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("start").cast("int").alias("start"),
                        F.col("fin").cast("int").alias("fin"),
                    )
                )
            ).alias("spans")
        )
    )
    base = docs.filter(F.col("text").isNotNull()).select("doc_id", "text")
    rebuilt = F.expr(
        """
        aggregate(spans,
          struct(CAST(1 AS INT) AS pos, CAST('' AS STRING) AS acc),
          (s, x) -> struct(x.fin AS pos,
                           concat(s.acc, substr(text, s.pos, x.start - s.pos)) AS acc),
          s -> concat(s.acc, substr(text, s.pos,
                                    greatest(length(text) - s.pos + 1, 0))))"""
    )
    return (
        base.join(spans_arr, "doc_id", "left")
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            F.when(F.col("spans").isNull(), F.col("text")).otherwise(rebuilt).alias(
                "text_clean"
            ),
        )
        .withColumn("n_chars_clean", F.length("text_clean").cast("long"))
        .withColumn(
            "removed_chars", (F.col("n_chars") - F.col("n_chars_clean")).cast("long")
        )
        .select("doc_id", "n_chars", "n_chars_clean", "removed_chars", "text_clean")
    )
