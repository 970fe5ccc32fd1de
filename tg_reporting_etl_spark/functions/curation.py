"""End-to-end corpus curation: the composition every training-data
pipeline runs before tokenization — quality floor, within-doc
repetition ceiling, near-dup removal — emitting the surviving corpus
and its per-source token budget.

Each stage is an operator that is oracle-checked on its own elsewhere
in the catalog (doc_quality, doc_repetition, doc_dup_components); this
module is their composition, itself oracle-checked end to end
(plans/llm_plans.py: corpus_curation), so a drift in any stage's
semantics surfaces twice.

Scale shape: the quality/repetition signals are pure column
expressions over one documents scan; the dedup drop-list is an
anti-join against the (tiny) non-keeper side of the component
labeling; the final stats are one partial-aggregable groupBy on the
bounded source key.  Nothing here adds a shuffle beyond what the
component labeling already paid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions.text import repetition_stats, with_quality


def curate_corpus(
    docs: DataFrame,
    components: DataFrame,
    min_quality: float = 0.3,
    max_dup_fraction: float = 0.6,
) -> DataFrame:
    """Surviving docs after the three standard filters.

    - ``quality`` (rounded to 6, so twin engines agree at the
      threshold boundary) must be >= ``min_quality``;
    - ``dup_token_fraction`` (rounded to 6) must be <=
      ``max_dup_fraction``;
    - docs that sit in a near-dup component WITHOUT being its keeper
      are anti-joined away (``components`` is (doc_id, component_id),
      e.g. :func:`~tg_reporting_etl_spark.functions.dedup.connected_components`).

    Output: (doc_id, source, n_tokens, quality, dup_token_fraction).
    """
    scored = with_quality(docs).select(
        "doc_id", "source", "n_tokens", F.round("quality", 6).alias("quality")
    )
    rep = repetition_stats(docs).select(
        "doc_id", F.round("dup_token_fraction", 6).alias("dup_token_fraction")
    )
    dropped = components.filter(F.col("doc_id") != F.col("component_id")).select("doc_id")
    return (
        scored.join(rep, "doc_id")
        .filter(
            (F.col("quality") >= min_quality)
            & (F.col("dup_token_fraction") <= max_dup_fraction)
        )
        .join(dropped, "doc_id", "left_anti")
    )


def corpus_budget(kept: DataFrame) -> DataFrame:
    """Per-source doc and token budget of the curated corpus — the
    number a data-mixing plan consumes (source, n_docs, n_tokens)."""
    return kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
