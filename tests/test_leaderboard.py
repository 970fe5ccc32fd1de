"""Leaderboard invariants (SURVEY §5.5): board size, displacement,
rank shape, bonus count, determinism."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.operators.leaderboard import (
    TOP_N,
    leaderboard_config,
    vnd_ou_leaderboard,
)

STATE_DATE = "1996-06-15"


@pytest.fixture(scope="module")
def board(spark, sf_dir):
    return vnd_ou_leaderboard(
        td.player(spark, sf_dir),
        td.player_daily_ranking(spark, sf_dir),
        leaderboard_config(spark),
        STATE_DATE,
    ).cache()


KEYS = ["platform", "site_code", "game_code", "room_type", "country"]


def test_board_size_capped_at_20(board):
    sizes = board.groupBy(*KEYS).count().collect()
    assert sizes, "no combos produced"
    assert all(r["count"] <= TOP_N for r in sizes)


def test_ranks_are_1_to_n(board):
    bad = (
        board.groupBy(*KEYS)
        .agg(F.min("rank_no").alias("lo"), F.max("rank_no").alias("hi"), F.count("*").alias("n"))
        .filter((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
        .count()
    )
    assert bad == 0


def test_robots_strictly_above_real_players(board, spark, sf_dir):
    """The displacement invariant: min robot win > max real-player win."""
    pdr = td.player_daily_ranking(spark, sf_dir)
    real_max = (
        pdr.filter((F.col("state_date") == STATE_DATE) & (~F.col("is_robot")))
        .groupBy(*KEYS)
        .agg(F.max("win").alias("real_max"))
    )
    joined = (
        board.groupBy(*KEYS)
        .agg(F.min("win").alias("robot_min"))
        .join(real_max, KEYS, "left")
        .na.fill({"real_max": 0.0})
    )
    assert joined.filter(F.col("robot_min") <= F.col("real_max")).count() == 0


def test_bonus_count_in_range(board):
    counts = board.groupBy(*KEYS).agg(F.sum(F.col("is_bonus").cast("int")).alias("nb")).collect()
    for r in counts:
        assert 0 < r.nb <= 8


def test_deterministic(board, spark, sf_dir):
    again = vnd_ou_leaderboard(
        td.player(spark, sf_dir),
        td.player_daily_ranking(spark, sf_dir),
        leaderboard_config(spark),
        STATE_DATE,
    )
    assert board.exceptAll(again).count() == 0
    assert again.exceptAll(board).count() == 0
