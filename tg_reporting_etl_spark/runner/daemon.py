"""Long-running scheduler daemon — the reference's cron loop as a
composable, clock-injectable library.

Reference: task-producer/main.py:101-123 runs ``schedule`` jobs — the
task producer every 5 minutes (hourly at :00, :05, ... :55), the manual
rerun scan every minute, and an hourly heartbeat — around the pipelines
ScanTaskBoard -> GetNewTaskList -> FilterDisabled -> ProduceNewTask and
ScanRerunManually -> ... -> ProduceRerunTask, with every job wrapped in
a timing/log decorator (main.py:42-58) and failures routed through
monitor/ErrorHandler.

Spark-first shape: each cron job is a TICK over DataFrames —

- producer tick:   board watermarks -> :func:`mint_tasks` -> disabled
  filter -> idempotent merge of the new ``done=0`` task rows;
- rerun tick:      :func:`consume_rerun_requests` over the parquet
  journal -> merge expanded tasks onto the board;
- executor tick:   :func:`execute_board` over pending rows -> merge
  completions back (the reference splits producer/executor across
  processes polling a DB; one loop composing both is the single-driver
  equivalent — the board parquet stays the shared queue, so splitting
  the ticks across two daemons needs no code change);
- heartbeat tick:  one Notifier message (main.py:95-97).

Determinism: both the clock and the scheduler are injectable.  Tests
drive :meth:`Daemon.run_pending` with simulated datetimes — no sleeps,
no wall clock; production calls :meth:`Daemon.run` which is the plain
sleep loop of the reference's ``schedule.run_pending()`` idiom
(main.py:126-130).
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tg_reporting_etl_spark.runner.board import mint_tasks
from tg_reporting_etl_spark.runner.executor import ReportFamily, execute_board
from tg_reporting_etl_spark.runner.monitor import Notifier, run_pipeline
from tg_reporting_etl_spark.runner.rerun import consume_rerun_requests
from tg_reporting_etl_spark.sources.writers import merge_into

#: board identity — one row per (family window, scope); the merge key
#: for both task minting and completion write-back.
TASK_KEYS = [
    "report_class",
    "freq_type",
    "platform",
    "site_code",
    "game_code",
    "gte_time",
    "lt_time",
]

_FMT = "%Y-%m-%d %H:%M:%S"


def _now_s(now: datetime) -> str:
    return now.strftime(_FMT)


@dataclass
class Job:
    """One scheduled job: run ``fn`` every ``every_s`` seconds, aligned
    to the epoch grid (the reference schedules at :00/:05/... marks, so
    alignment — not first-call offset — defines the cadence)."""

    name: str
    every_s: int
    fn: Callable[[datetime], object]
    next_due: datetime | None = None

    def _grid(self, now: datetime, bump: int) -> datetime:
        epoch = datetime(1970, 1, 1, tzinfo=now.tzinfo)
        elapsed = (now - epoch).total_seconds()
        return epoch + timedelta(seconds=(int(elapsed) // self.every_s + bump) * self.every_s)

    def first_due(self, now: datetime) -> datetime:
        """Grid mark at-or-after ``now`` (a start exactly on the mark
        fires on the first tick, like ``schedule``'s :00 jobs)."""
        floor = self._grid(now, 0)
        return floor if floor == now else self._grid(now, 1)

    def next_after(self, now: datetime) -> datetime:
        """Grid mark strictly after ``now``."""
        return self._grid(now, 1)


@dataclass
class Scheduler:
    """Deterministic replacement for the ``schedule`` library: jobs fire
    when ``run_pending(now)`` observes ``now >= next_due``; the caller
    owns the clock."""

    jobs: list[Job] = field(default_factory=list)

    def add(self, name: str, every_s: int, fn: Callable[[datetime], object]) -> Job:
        job = Job(name, every_s, fn)
        self.jobs.append(job)
        return job

    def run_pending(self, now: datetime) -> list[str]:
        """Fire every due job once, in registration order; returns the
        names that ran.  A job that missed several grid marks while a
        previous tick ran long fires ONCE and realigns (the reference's
        ``schedule`` semantics — no backfill storm after a stall)."""
        ran = []
        for job in self.jobs:
            if job.next_due is None:
                job.next_due = job.first_due(now)
            if now >= job.next_due:
                job.fn(now)
                ran.append(job.name)
                job.next_due = job.next_after(now)
        return ran


class Daemon:
    """mint -> gate -> execute -> rerun-scan on a clock.

    Parameters mirror the reference's config surface (task_config.py):
    ``disabled`` is the FilterDisabled report-class set
    (task-producer/task_producer/FilterDisabled.py), ``producer_every_s``
    / ``rerun_every_s`` / ``heartbeat_every_s`` the main.py:101-123 cron
    cadences.  ``clock`` defaults to wall time; tests inject a frozen or
    stepped callable.
    """

    def __init__(
        self,
        spark: SparkSession,
        board_path: str,
        families: list[ReportFamily],
        journal_path: str | None = None,
        notifier: Notifier | None = None,
        error_log_path: str | None = None,
        disabled: frozenset[str] | set[str] = frozenset(),
        clock: Callable[[], datetime] | None = None,
        producer_every_s: int = 300,
        rerun_every_s: int = 60,
        heartbeat_every_s: int = 3600,
        title: str = "tg-reporting-etl-spark daemon",
    ) -> None:
        self.spark = spark
        self.board_path = board_path
        self.families = families
        self.journal_path = journal_path
        self.notifier = notifier
        self.error_log_path = error_log_path
        self.disabled = frozenset(disabled)
        self.clock = clock or datetime.now
        self.title = title
        self.scheduler = Scheduler()
        self.scheduler.add("producer", producer_every_s, self.producer_tick)
        if journal_path is not None:
            self.scheduler.add("rerun", rerun_every_s, self.rerun_tick)
        self.scheduler.add("executor", producer_every_s, self.executor_tick)
        if notifier is not None:
            self.scheduler.add("heartbeat", heartbeat_every_s, self.heartbeat_tick)

    # ------------------------------------------------------------ board I/O

    def read_board(self) -> DataFrame:
        return self.spark.read.parquet(self.board_path)

    def _merge_board(self, rows: DataFrame) -> None:
        merge_into(self.spark, self.board_path, rows, keys=TASK_KEYS)

    # --------------------------------------------------------------- ticks

    def producer_tick(self, now: datetime) -> int:
        """ScanTaskBoard -> GetNewTaskList -> FilterDisabled ->
        ProduceNewTask (task-producer/main.py:61-71) as one declarative
        plan: per-family watermark (max lt_time over EVERY minted row,
        done or not — minting must never duplicate an open window),
        expand to new unit windows ending at/before ``now``, drop
        disabled classes, idempotently merge as ``done=0`` rows."""

        def _step(_data, _ctx) -> int:
            board = self.read_board()
            watermarks = board.groupBy(
                "report_class",
                "assignee",
                "freq_type",
                "level",
                "platform",
                "site_code",
                "game_code",
            ).agg(F.max("lt_time").alias("max_lt_time"))
            fresh = mint_tasks(watermarks, _now_s(now))
            if self.disabled:
                fresh = fresh.filter(~F.col("report_class").isin(list(self.disabled)))
            fresh = fresh.withColumn("done", F.lit(0))
            # anti-join before the merge: minted rows that already exist
            # on the board (e.g. a rerun re-opened the window) must not
            # be reset — the producer only ever ADDS windows.
            new = fresh.join(board.select(*TASK_KEYS), TASK_KEYS, "left_anti")
            new = new.persist()
            try:
                n = new.count()
                if n:
                    self._merge_board(new)
            finally:
                new.unpersist()
            return n

        return self._run_step("producer_tick", _step)

    def rerun_tick(self, now: datetime) -> int:
        """ScanRerunManually -> GetRelatedTimeSplit -> GetRerunTaskList
        -> ProduceRerunTask (main.py:74-84): consume pending journal
        requests, expand the cascade, and merge the expanded tasks onto
        the board as ``done=0`` — re-opening any window the cascade
        touches (the reference INSERTs rerun_board rows the executors
        then re-run)."""

        def _step(_data, _ctx) -> int:
            tasks = consume_rerun_requests(self.spark, self.journal_path, _now_s(now))
            if tasks.limit(1).isEmpty():
                return 0
            tasks = tasks.withColumn("done", F.lit(0))
            n = tasks.count()
            self._merge_board(tasks.select(*self.read_board().columns))
            return n

        return self._run_step("rerun_tick", _step)

    def executor_tick(self, now: datetime) -> list[dict]:
        """Run every pending closed window through the registered
        families and merge completions back onto the board (the
        DB-as-queue consumer half, task-executor/utils/ExecUtils.py)."""

        def _step(_data, _ctx) -> list[dict]:
            board = self.read_board()
            records = execute_board(self.spark, board, self.families, _now_s(now))
            done = [r for r in records if r["done"] == 1]
            if done:
                rows = self.spark.createDataFrame(
                    [
                        (
                            r["report_class"],
                            r["freq_type"],
                            r["platform"],
                            r["site_code"],
                            r["gte_time"],
                            r["lt_time"],
                            1,
                        )
                        for r in done
                    ],
                    "report_class string, freq_type string, platform string, "
                    "site_code string, gte_time timestamp, lt_time timestamp, done int",
                )
                # Completions merge back on TASK_KEYS minus game_code:
                # execute_board dispatches set-oriented (each run_tier
                # computes EVERY game of a family/window at once), so
                # one all-games run closes all game-scoped rows of the
                # window.  The dropDuplicates is load-bearing: a window
                # carrying N game-scoped board rows yields N completion
                # records that are identical once game_code is dropped,
                # and joining them un-deduped fans the board out N-fold
                # (pinned by test_completion_merge_marks_all_game_scoped
                # _rows).  If a family ever gains game-scoped run_tier
                # dispatch, game_code must join the merge-back key.
                keep = board.drop("done").join(
                    rows.select(
                        *[c for c in TASK_KEYS if c != "game_code"], "done"
                    ).dropDuplicates(),
                    [c for c in TASK_KEYS if c != "game_code"],
                )
                self._merge_board(keep)
            return records

        return self._run_step("executor_tick", _step) or []

    def heartbeat_tick(self, now: datetime) -> None:
        """Hourly liveness ping (main.py:95-97) through the Notifier
        protocol — transport-free in this repo by design."""
        self.notifier.send(f"{self.title} heartbeat {_now_s(now)}")

    # ---------------------------------------------------------------- loop

    def _run_step(self, name: str, step):
        """One tick under the reference's retry/error-log/alert contract
        (PipelineUtils + ErrorHandler, via monitor.run_pipeline)."""
        step.__name__ = name  # error-log `process` column shows the tick
        return run_pipeline(
            [step],
            {"pipeline": "daemon", "process": name},
            spark=self.spark,
            error_log_path=self.error_log_path,
            notifier=self.notifier,
            title=self.title,
        )

    def run_pending(self, now: datetime | None = None) -> list[str]:
        """Fire whatever is due at ``now`` (default: injected clock).
        The test-facing entry point — drive simulated ticks directly."""
        return self.scheduler.run_pending(now or self.clock())

    def run(
        self,
        until: datetime | None = None,
        poll_s: float = 1.0,
        sleep: Callable[[float], None] = _time.sleep,
    ) -> None:
        """The production loop (main.py:126-130): poll the scheduler
        until ``until`` (forever when None).  ``sleep`` is injectable so
        even the loop itself is testable without wall-clock time."""
        while True:
            now = self.clock()
            if until is not None and now >= until:
                return
            self.run_pending(now)
            sleep(poll_s)
