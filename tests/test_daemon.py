"""Scheduler daemon: mint -> execute -> rerun-scan on an injectable
clock (reference task-producer/main.py:101-130), no sleeps, no wall
time.  Two simulated ticks over a tmp board must mint new windows,
materialize tier parquet, and write completion state back."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.runner.board import LEVELS
from tg_reporting_etl_spark.runner.daemon import Daemon, Scheduler
from tg_reporting_etl_spark.runner.executor import TransSummaryFamily
from tg_reporting_etl_spark.runner.monitor import CollectingNotifier
from tg_reporting_etl_spark.runner.timeslice import expand_timeslices


def _dt(s: str) -> datetime:
    return datetime.fromisoformat(s)


# ------------------------------------------------------------- scheduler


def test_scheduler_grid_alignment():
    fired: list[tuple[str, datetime]] = []
    s = Scheduler()
    s.add("five", 300, lambda now: fired.append(("five", now)))
    s.add("one", 60, lambda now: fired.append(("one", now)))

    t0 = _dt("2024-01-01 00:05:00")  # exactly on both grids
    assert s.run_pending(t0) == ["five", "one"]
    # 40s later: nothing due
    assert s.run_pending(t0 + timedelta(seconds=40)) == []
    # at :06 the 1-min job fires alone
    assert s.run_pending(t0 + timedelta(minutes=1)) == ["one"]
    # a long stall spanning several marks fires each job ONCE, no backfill storm
    assert s.run_pending(t0 + timedelta(minutes=17)) == ["five", "one"]
    assert len(fired) == 5


def test_scheduler_off_grid_start_waits_for_next_mark():
    fired = []
    s = Scheduler()
    s.add("five", 300, lambda now: fired.append(now))
    assert s.run_pending(_dt("2024-01-01 00:03:21")) == []
    assert s.run_pending(_dt("2024-01-01 00:04:59")) == []
    assert s.run_pending(_dt("2024-01-01 00:05:00")) == ["five"]


# ---------------------------------------------------------------- daemon


G0 = "2024-01-02 00:00:00"


def _seed_board(spark, path: str) -> None:
    """One already-done 5min window = the producer watermark seed."""
    meta = spark.createDataFrame(
        [
            (
                G0,
                "2024-01-02 00:05:00",
                "ALL",
                "ALL",
                "ALL",
                "trans_summary",
                "trans_summary_5min",
                "5min",
                LEVELS["5min"],
            )
        ],
        "gte_time string, lt_time string, platform string, site_code string, "
        "game_code string, report_class string, assignee string, freq_type string, level int",
    )
    meta = meta.withColumn("gte_time", F.col("gte_time").cast("timestamp")).withColumn(
        "lt_time", F.col("lt_time").cast("timestamp")
    )
    expand_timeslices(meta).withColumn("done", F.lit(1)).write.parquet(path)


@pytest.fixture()
def daemon_env(spark, sf_dir, tmp_path):
    board = str(tmp_path / "board")
    out = str(tmp_path / "tables")
    _seed_board(spark, board)
    family = TransSummaryFamily(td.player_value_log(spark, sf_dir), out)
    notifier = CollectingNotifier()
    d = Daemon(
        spark,
        board,
        [family],
        journal_path=str(tmp_path / "journal"),
        notifier=notifier,
        error_log_path=str(tmp_path / "error_log"),
    )
    return d, family, notifier


def test_two_ticks_mint_execute_and_persist(daemon_env, spark):
    d, family, notifier = daemon_env

    # tick 1 at 00:45 — producer mints 00:05-00:45 (8 windows, several
    # holding sf0.001 wallet rows), executor runs and closes them (the
    # hourly heartbeat is grid-aligned to :00, so it is NOT due mid-hour)
    ran = d.run_pending(_dt("2024-01-02 00:45:00"))
    assert ran == ["producer", "rerun", "executor"]
    board = d.read_board()
    assert board.count() == 9  # seed + 8 minted
    assert board.filter(F.col("done") == 0).count() == 0  # all closed windows done
    t5 = family.read_tier(spark, "5min")
    assert t5.count() > 0  # tier parquet materialized

    # tick 2 at 00:50 — exactly one new window minted and executed
    ran = d.run_pending(_dt("2024-01-02 00:50:00"))
    assert "producer" in ran and "executor" in ran
    board = d.read_board()
    assert board.count() == 10
    assert board.filter(F.col("done") == 0).count() == 0

    # tick 3 on the hour mark — the heartbeat fires exactly once
    assert notifier.messages == []
    ran = d.run_pending(_dt("2024-01-02 01:00:00"))
    assert "heartbeat" in ran
    assert len([m for m in notifier.messages if "heartbeat" in m]) == 1


def test_rerun_tick_reopens_and_reexecutes(daemon_env, spark):
    d, family, notifier = daemon_env
    d.run_pending(_dt("2024-01-02 00:20:00"))

    # an operator files a manual rerun for the first window
    from tg_reporting_etl_spark.runner.rerun import submit_rerun_requests

    req = spark.createDataFrame(
        [("ALL", "ALL", "ALL", "trans_summary", G0, "2024-01-02 00:05:00", 1, 0, 0, 0)],
        "platform string, site_code string, game_code string, report_class string, "
        "gte_time string, lt_time string, `5min` int, `1h` int, `1d` int, `1m` int",
    )
    req = req.withColumn("gte_time", F.col("gte_time").cast("timestamp")).withColumn(
        "lt_time", F.col("lt_time").cast("timestamp")
    )
    submit_rerun_requests(spark, d.journal_path, req)

    # next minute tick: rerun scan re-opens the window, executor closes it again
    ran = d.run_pending(_dt("2024-01-02 00:21:00"))
    assert ran == ["rerun"]  # only the 1-min job is due at :21
    assert d.read_board().filter(F.col("done") == 0).count() == 1
    d.run_pending(_dt("2024-01-02 00:25:00"))
    board = d.read_board()
    assert board.filter(F.col("done") == 0).count() == 0
    assert board.count() == 5  # re-open replaced, not duplicated


def test_failure_routes_to_error_log_and_notifier(spark, sf_dir, tmp_path):
    board = str(tmp_path / "board")
    _seed_board(spark, board)

    class BoomFamily(TransSummaryFamily):
        def run_tier(self, *a, **k):
            raise RuntimeError("boom")

    notifier = CollectingNotifier()
    d = Daemon(
        spark,
        board,
        [BoomFamily(td.player_value_log(spark, sf_dir), str(tmp_path / "t"))],
        notifier=notifier,
        error_log_path=str(tmp_path / "error_log"),
    )
    d.run_pending(_dt("2024-01-02 00:20:00"))  # must not raise
    from tg_reporting_etl_spark.runner.monitor import read_error_log

    log = read_error_log(spark, str(tmp_path / "error_log"))
    assert log.filter(F.col("process") == "executor_tick").count() == 1
    assert any("boom" in m for m in notifier.messages)
    # board untouched: the failed window stays pending for the next tick
    assert d.read_board().filter(F.col("done") == 0).count() > 0


def test_completion_merge_marks_all_game_scoped_rows(spark, sf_dir, tmp_path):
    """Pin the executor-tick completion-merge invariant
    (runner/daemon.py executor_tick): completions merge back on
    TASK_KEYS MINUS game_code, so when a family/window carries several
    game-scoped board rows, ONE all-games run marks every one of them
    done.  That is correct under the current set-oriented dispatch —
    ``execute_board`` groups pending rows by (family, freq, platform,
    site) only and each ``run_tier`` computes every game at once — but
    it is an implicit contract: if a family ever gains game-scoped
    ``run_tier`` dispatch, this test is the tripwire that forces
    game_code into the merge-back key."""
    board_path = str(tmp_path / "board")
    meta = spark.createDataFrame(
        [
            (G0, "2024-01-02 00:05:00", "ALL", "ALL", g, "trans_summary",
             "trans_summary_5min", "5min", LEVELS["5min"])
            for g in ("game_a", "game_b")
        ],
        "gte_time string, lt_time string, platform string, site_code string, "
        "game_code string, report_class string, assignee string, freq_type string, level int",
    )
    meta = meta.withColumn("gte_time", F.col("gte_time").cast("timestamp")).withColumn(
        "lt_time", F.col("lt_time").cast("timestamp")
    )
    expand_timeslices(meta).withColumn("done", F.lit(0)).write.parquet(board_path)

    family = TransSummaryFamily(td.player_value_log(spark, sf_dir), str(tmp_path / "t"))
    d = Daemon(spark, board_path, [family], error_log_path=str(tmp_path / "error_log"))
    d.executor_tick(_dt("2024-01-02 00:20:00"))

    board = d.read_board().select("game_code", "done").collect()
    done_by_game = {r.game_code: r.done for r in board}
    # both game-scoped rows of the one window exist and BOTH are done
    assert done_by_game == {"game_a": 1, "game_b": 1}
    # no rows duplicated or dropped by the merge-back
    assert len(board) == 2
