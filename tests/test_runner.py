"""Runner layer: board scan/union, rerun cascade bounds, dependency gate."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.runner.board import dependency_check, rerun_cascade, scan_task_board
from tg_reporting_etl_spark.runner.timeslice import PASSTHROUGH

TASK_COLS = [
    "gte_time",
    "lt_time",
    "platform",
    "site_code",
    "game_code",
    "report_class",
    "assignee",
    "freq_type",
    "level",
    "done",
]


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_scan_task_board_union_and_order(spark):
    mk = lambda rows: spark.createDataFrame(rows, TASK_COLS)
    board = mk(
        [
            (_ts("2024-01-01 01:00:00"), _ts("2024-01-01 02:00:00"), "ALL", "ALL", "ALL", "trans_summary", "trans_summary_1h", "1H", 200, 0),
            (_ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:05:00"), "ALL", "ALL", "ALL", "trans_summary", "trans_summary_5min", "5min", 100, 0),
            (_ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:05:00"), "ALL", "ALL", "ALL", "trans_summary", "trans_summary_5min", "5min", 100, 1),
            (_ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:05:00"), "ALL", "ALL", "ALL", "player_summary", "player_summary_5min", "5min", 100, 0),
        ]
    )
    rerun = mk([(_ts("2024-01-01 00:05:00"), _ts("2024-01-01 00:10:00"), "ALL", "ALL", "ALL", "trans_summary", "trans_summary_5min", "5min", 100, 0)])
    out = scan_task_board(board, rerun, "trans_summary").collect()
    assert len(out) == 3  # done=1 and other report_class filtered out
    assert [r.level for r in out] == [100, 100, 200]  # priority order
    assert {r.is_rerun for r in out} == {0, 1}


@pytest.fixture(scope="module")
def cascade(spark):
    req = spark.createDataFrame(
        [
            (
                _ts("2024-01-10 10:12:00"),
                _ts("2024-01-10 13:40:00"),
                "ALL", "ALL", "ALL", "trans_summary", 1, 1, 1, 1,
            )
        ],
        "gte_time timestamp, lt_time timestamp, platform string, site_code string, "
        "game_code string, report_class string, `5min` int, `1h` int, `1d` int, `1m` int",
    )
    out = rerun_cascade(req)
    return {f: out.filter(out.freq_type == f) for f in ("5min", "1H", "1D", "1M")}


def test_cascade_5min_slices(cascade):
    rows = sorted(cascade["5min"].collect(), key=lambda r: r.gte_time)
    # reference date_range starts at the raw (unfloored) gte for 5min
    assert rows[0].gte_time == _ts("2024-01-10 10:12:00")
    assert rows[-1].lt_time <= _ts("2024-01-10 13:40:00")
    assert all(r.level == 100 and r.assignee == "trans_summary_5min" for r in rows)


def test_cascade_hour_floor_ceil(cascade):
    rows = sorted(cascade["1H"].collect(), key=lambda r: r.gte_time)
    assert rows[0].gte_time == _ts("2024-01-10 10:00:00")  # floored
    assert rows[-1].lt_time == _ts("2024-01-10 14:00:00")  # ceiled
    assert len(rows) == 4 and all(r.level == 200 for r in rows)


def test_cascade_day_and_month(cascade):
    d = cascade["1D"].collect()
    assert len(d) == 1
    assert (d[0].gte_time, d[0].lt_time) == (_ts("2024-01-10 00:00:00"), _ts("2024-01-11 00:00:00"))
    m = cascade["1M"].collect()
    # lt not at a month boundary -> carry to next month start: [1/1, 2/1)
    assert len(m) == 1
    assert (m[0].gte_time, m[0].lt_time) == (_ts("2024-01-01 00:00:00"), _ts("2024-02-01 00:00:00"))
    assert m[0].level == 400


def test_degenerate_range_dropped(spark):
    req = spark.createDataFrame(
        [
            (
                _ts("2024-01-10 10:00:00"),
                _ts("2024-01-10 10:00:00"),  # empty request range
                "ALL", "ALL", "ALL", "trans_summary", 0, 1, 0, 0,
            )
        ],
        "gte_time timestamp, lt_time timestamp, platform string, site_code string, "
        "game_code string, report_class string, `5min` int, `1h` int, `1d` int, `1m` int",
    )
    # floor==ceil -> gte_time == lt_time -> P9 guard drops it
    assert rerun_cascade(req).count() == 0


def test_sub_unit_span_expands_to_zero_windows(spark):
    """A rerun spanning less than one 5-min unit (the 5min path keeps
    raw bounds, matching the reference) must yield zero windows, not an
    IllegalArgumentException from F.sequence(start > stop)."""
    req = spark.createDataFrame(
        [
            (
                _ts("2024-01-10 10:00:00"),
                _ts("2024-01-10 10:03:00"),  # < one 5-min unit
                "ALL", "ALL", "ALL", "trans_summary", 1, 0, 0, 0,
            )
        ],
        "gte_time timestamp, lt_time timestamp, platform string, site_code string, "
        "game_code string, report_class string, `5min` int, `1h` int, `1d` int, `1m` int",
    )
    assert rerun_cascade(req).count() == 0


def test_sub_day_month_crossing_span(spark):
    """A sub-day 1M meta row whose lt-1d crosses back over a month
    boundary must expand to zero windows, not crash the month sequence."""
    from tg_reporting_etl_spark.runner.timeslice import expand_timeslices

    meta = spark.createDataFrame(
        [
            (
                _ts("2024-03-01 00:30:00"),
                _ts("2024-03-01 02:00:00"),
                "ALL", "ALL", "ALL", "trans_summary", "trans_summary_1m", "1M", 400,
            )
        ],
        "gte_time timestamp, lt_time timestamp, platform string, site_code string, "
        "game_code string, report_class string, assignee string, freq_type string, level int",
    )
    assert expand_timeslices(meta).count() == 0


def test_dependency_gate(spark):
    def task(gte, lt, assignee, freq, done=0):
        return (_ts(gte), _ts(lt), "ALL", "ALL", "ALL", "trans_summary", assignee, freq, 100, done)

    tasks = spark.createDataFrame(
        [
            task("2024-01-01 00:00:00", "2024-01-01 01:00:00", "trans_summary_1h", "1H"),
            task("2024-01-01 01:00:00", "2024-01-01 02:00:00", "trans_summary_1h", "1H"),
            task("2024-01-01 00:00:00", "2024-01-01 00:05:00", "trans_summary_5min", "5min"),
        ],
        TASK_COLS,
    )
    # 12 done 5-min children for hour 0; only 3 for hour 1
    done_rows = [
        task(f"2024-01-01 00:{m:02d}:00", f"2024-01-01 00:{m + 5:02d}:00", "trans_summary_5min", "5min", done=1)
        for m in range(0, 55, 5)
    ] + [task("2024-01-01 00:55:00", "2024-01-01 01:00:00", "trans_summary_5min", "5min", done=1)]
    done_rows += [
        task(f"2024-01-01 01:{m:02d}:00", f"2024-01-01 01:{m + 5:02d}:00", "trans_summary_5min", "5min", done=1)
        for m in (0, 5, 10)
    ]
    done = spark.createDataFrame(done_rows, TASK_COLS)
    out = {
        (r.freq_type, r.gte_time): r
        for r in dependency_check(tasks.drop("done"), done).select(
            "gte_time", "lt_time", *PASSTHROUGH, "dep_count", "matched"
        ).collect()
    }
    assert out[("5min", _ts("2024-01-01 00:00:00"))].matched == 1  # auto-pass
    assert out[("1H", _ts("2024-01-01 00:00:00"))].matched == 1  # 12/12
    assert out[("1H", _ts("2024-01-01 00:00:00"))].dep_count == 12
    assert out[("1H", _ts("2024-01-01 01:00:00"))].matched == 0  # 3/12
