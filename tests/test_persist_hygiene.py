"""Intra-query persists are tracked and released by clear_df_cache —
a long-lived driver must not accumulate cached blocks (VERDICT r3 #7)."""

from __future__ import annotations

import datetime as dt

from tg_reporting_etl_spark.functions.dedup import (
    minhash_dedup,
    ngram_jaccard_dedup_capped,
    simhash_dedup,
)
from tg_reporting_etl_spark.operators.risk_ctrl_rtp import run_rtp_scenario
from tg_reporting_etl_spark.plans.util import clear_df_cache


def _docs(spark):
    rows = [(i, f"alpha beta gamma delta {i % 7} epsilon zeta") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _player_1h(spark):
    rows = [
        ("P1", "S1", f"u{i}", "G1", "TW", 20240102, 100.0, 120.0) for i in range(5)
    ]
    return spark.createDataFrame(
        rows,
        "platform string, site_code string, player_name string, game_code string, "
        "country string, summary_date int, b_amount double, profit_amount double",
    )


def test_dedup_and_rtp_persists_all_released(spark):
    cm = spark._jsparkSession.sharedState().cacheManager()
    # start clean regardless of earlier tests — test fixtures cache
    # frames of their own, which are not the engine's responsibility
    clear_df_cache()
    spark.catalog.clearCache()
    assert cm.isEmpty()

    docs = _docs(spark)
    ngram_jaccard_dedup_capped(docs, tau=0.8).count()
    minhash_dedup(docs, tau=0.8).count()
    simhash_dedup(docs).count()
    clocks = [dt.datetime(2024, 1, 2, 10, 0), dt.datetime(2024, 1, 2, 11, 0)]
    run_rtp_scenario([_player_1h(spark), _player_1h(spark)], 20240102, clocks).count()
    assert not cm.isEmpty()  # the intermediates really were persisted

    clear_df_cache()
    assert cm.isEmpty()


def test_catalog_shared_caches_all_released(spark, sf_dir):
    """The round-7 session caches (components labeling, gram-df table,
    shingles, capped pairs) all register with the tracked-cache registry
    and release on clear_df_cache — a long-lived driver serving the
    catalog cannot accumulate blocks."""
    import __spark_entry__ as em

    cm = spark._jsparkSession.sharedState().cacheManager()
    clear_df_cache()
    spark.catalog.clearCache()
    assert cm.isEmpty()

    qs = em.queries()
    for name in ("doc_dup_components", "doc_dedup_best_rep",
                 "doc_boilerplate_fraction", "corpus_curation"):
        qs[name](spark, sf_dir).count()
    assert not cm.isEmpty()

    clear_df_cache()
    assert cm.isEmpty()
