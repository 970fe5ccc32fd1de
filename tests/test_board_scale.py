"""Board-scale orchestration stress: execute_board over a ~10k-task board.

The executor's one driver-side ``collect()`` is on board task METADATA
(constant-size rows, never data) — this test turns that argument into an
asserted ceiling: wall-clock and driver-side Python allocations stay
bounded while 10,000 tasks collapse into one ranged job per
(family, freq, platform, site) group, exactly the set-oriented rewrite
of the reference's per-row iterrows loop (ExecUtils.py:57-84).
"""

from __future__ import annotations

import datetime as dt
import time
import tracemalloc

from tg_reporting_etl_spark.runner.executor import ReportFamily, execute_board

N_PLATFORMS, N_SITES, N_DAYS = 10, 5, 200  # 10_000 tasks


class _StubFamily(ReportFamily):
    """Records run_tier invocations; no Spark jobs — the stress target
    is the orchestration layer, not tier computation."""

    report_class = "stress"
    tiers = ("1d",)

    def __init__(self):
        super().__init__(out_dir="/unused")
        self.calls: list[tuple] = []

    def run_tier(self, spark, tier, gte, lt, platform="ALL", site_code="ALL"):
        self.calls.append((tier, gte, lt, platform, site_code))
        return 1


def _board(spark):
    day0 = dt.datetime(2023, 1, 1)
    rows = [
        (
            day0 + dt.timedelta(days=d),
            day0 + dt.timedelta(days=d + 1),
            f"P{p:02d}",
            f"S{s}",
            "stress",
            "1D",
            300,
            0,
        )
        for p in range(N_PLATFORMS)
        for s in range(N_SITES)
        for d in range(N_DAYS)
    ]
    return spark.createDataFrame(
        rows,
        "gte_time timestamp, lt_time timestamp, platform string, site_code string, "
        "report_class string, freq_type string, level int, done int",
    )


def test_execute_board_10k_tasks_bounded(spark):
    board = _board(spark)
    family = _StubFamily()

    tracemalloc.start()
    t0 = time.perf_counter()
    records = execute_board(spark, board, family, now="2024-01-01 00:00:00")
    wall = time.perf_counter() - t0
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    # every task produced a completion record, all closed windows done
    assert len(records) == N_PLATFORMS * N_SITES * N_DAYS
    assert all(r["done"] == 1 for r in records)

    # contiguous same-group tasks collapsed: ONE ranged job per
    # (platform, site), spanning the group's full [min_gte, max_lt)
    assert len(family.calls) == N_PLATFORMS * N_SITES
    for _, gte, lt, _, _ in family.calls:
        assert (gte, lt) == (dt.datetime(2023, 1, 1), dt.datetime(2023, 7, 20))

    # orchestration cost ceilings: seconds of driver work and tens of MB
    # of Python allocations for 10k metadata rows — NOT proportional to
    # any data volume.  Generous margins over measured (~5 s, ~25 MB
    # local) to absorb CI noise while still catching a driver-side
    # blowup (a collect() of real data would be GBs, minutes).
    assert wall < 60, f"execute_board took {wall:.1f}s for 10k metadata tasks"
    assert peak < 200 * 1024 * 1024, f"driver peak alloc {peak/1e6:.0f} MB"
