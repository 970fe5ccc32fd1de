"""Physical-plan regression guards: the properties that make the
operators scale (partition pruning, broadcast dims, codegen) asserted
from the formatted explain output, so a refactor that silently degrades
the plan (e.g. a filter that stops pruning, a dim join that falls back
to sort-merge) fails CI even while results stay correct."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from tg_reporting_etl_spark.adapters import testdata as td


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_tier_read_prunes_date_partitions(spark, sf_dir, tmp_path):
    """A date-key filter on a materialized tier must become a partition
    filter on the scan (the reference's DELETE-key layout exists exactly
    so reads touch only their window)."""
    from tg_reporting_etl_spark.sources.writers import overwrite_window_partitions

    rows = [("P1", 20240102 + d, 1.0) for d in range(3)]
    tier = spark.createDataFrame(rows, "platform string, summary_date int, v double")
    path = str(tmp_path / "tier_1d")
    overwrite_window_partitions(tier, path, ["summary_date"])

    pruned = spark.read.parquet(path).filter(F.col("summary_date") == 20240103)
    plan = _plan(pruned)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].splitlines()[0]
    assert "summary_date" in pf
    # and the filter really prunes: only one of three partitions read
    assert pruned.rdd.getNumPartitions() <= 2
    assert pruned.count() == 1


def test_player_summary_broadcasts_site_dim(spark, sf_dir):
    """The site-ratio dim join must be a broadcast join — a sort-merge
    here would shuffle the full fact table for a tiny dimension."""
    from tg_reporting_etl_spark.operators.player_summary import player_summary_5min

    df = player_summary_5min(
        td.player_profit_log(spark, sf_dir),
        td.game_sites(spark, sf_dir),
        "1996-06-14 00:00:00",
        "1996-06-15 00:00:00",
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_trans_summary_aggregates_map_side(spark, sf_dir):
    """The 5-min tier aggregation must keep its map-side combine
    (partial_sum before the exchange) — losing it ships every raw row
    through the shuffle at 100 TB."""
    from tg_reporting_etl_spark.operators.trans_summary import trans_summary_5min

    df = trans_summary_5min(
        td.player_value_log(spark, sf_dir), "2024-01-02 00:00:00", "2024-01-03 00:00:00"
    )
    plan = _plan(df)
    assert "partial_sum" in plan


def test_brute_force_topk_broadcasts_queries(spark, sf_dir):
    """The ANN baseline broadcasts the (small) query side so the corpus
    scan stays shuffle-free."""
    from tg_reporting_etl_spark.functions.similarity import brute_force_topk
    from tg_reporting_etl_spark.sources.readers import load_table

    df = brute_force_topk(load_table(spark, sf_dir, "embeddings"), F.col("vec_id") < 10, k=5)
    assert "BroadcastNestedLoopJoin" in _plan(df) or "BroadcastHashJoin" in _plan(df)
