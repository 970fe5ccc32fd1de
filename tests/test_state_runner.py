"""Runner state persistence + init seeding."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from tg_reporting_etl_spark.runner.board import (
    has_rows,
    init_date_structure,
    init_task_list,
    monthly_dep_backfill,
)
from tg_reporting_etl_spark.runner.state import run_rtp_day

D = 20230110
KEYS_COLS = [
    "platform", "site_code", "player_name", "game_code", "country",
    "summary_date", "b_amount", "profit_amount",
]


def _hours(spark, profit, n=12):
    rows = [("UFA", "TG", "p1", "01", "THB", D, 1000.0, profit / n) for _ in range(n)]
    return spark.createDataFrame(rows, KEYS_COLS)


def test_rtp_state_persists_across_runs(spark, tmp_path):
    """Snapshot round-trips through parquet; counters continue."""
    sd = str(tmp_path / "rtp_state")
    risky = _hours(spark, 60_000.0)
    s1 = run_rtp_day(spark, risky, D, dt.datetime(2023, 1, 10, 12, 0), sd)
    assert s1.first().alert_count == 0  # first run initializes only
    s2 = run_rtp_day(spark, risky, D, dt.datetime(2023, 1, 10, 12, 5), sd)
    assert s2.first().alert_count == 1  # reloaded state, alert fired
    s3 = run_rtp_day(spark, risky, D, dt.datetime(2023, 1, 10, 12, 5, 20), sd)
    r = s3.first()
    assert (r.alert_count, r.send_alert) == (1, 0)  # throttled, state kept


def test_init_seeding_and_monthly_backfill(spark):
    ds = init_date_structure(spark, "2022-10-25 00:00:00")
    rows = {r.freq_type: r for r in ds.collect()}
    assert rows["1M"].gte_time == dt.datetime(2022, 9, 1)
    assert rows["1M"].lt_time == dt.datetime(2022, 10, 1)
    assert rows["1D"].lt_time == dt.datetime(2022, 10, 26)

    reports = spark.createDataFrame(
        [
            ("trans_summary", "trans_summary_1d", "1D", 300),
            ("trans_summary", "trans_summary_1m", "1M", 400),
        ],
        "report_class string, assignee string, freq_type string, level int",
    )
    tasks = init_task_list(reports, ds, {"platform": "ALL", "site_code": "ALL", "game_code": "ALL"})
    assert has_rows(tasks)
    assert tasks.filter(F.col("done") != 0).count() == 0

    backfill = monthly_dep_backfill(tasks)
    # 1M covers [9/1, 10/1); 1D starts 10/25 -> backfill 10/1..10/24 done
    days = sorted(r.gte_time for r in backfill.collect())
    assert len(days) == 24
    assert days[0] == dt.datetime(2022, 10, 1)
    assert days[-1] == dt.datetime(2022, 10, 24)
    assert backfill.filter(F.col("done") != 1).count() == 0


def test_rtp_empty_day_snapshot_still_counts_as_state(spark, tmp_path):
    """A day first processed with ZERO batch rows must still register as
    stateful (empty marker partition), so its next batch takes the merge
    branch — throttle/cap runs and the alert fires with a counted,
    restamped state (1, 1) — instead of first-run init (0, 1, epoch)."""
    from tg_reporting_etl_spark.runner import state as st

    sd = str(tmp_path / "rtp_state")
    empty = _hours(spark, 60_000.0).filter(F.lit(False))
    st.run_rtp_days(spark, empty, [D], dt.datetime(2023, 1, 10, 11, 0), sd)
    assert st._existing_state_days(spark, sd, [D]) == [D]

    out = st.run_rtp_day(spark, _hours(spark, 60_000.0), D, dt.datetime(2023, 1, 10, 12, 0), sd)
    r = out.first()
    assert (r.alert_count, r.send_alert) == (1, 1)
    assert r.last_alert_time == dt.datetime(2023, 1, 10, 12, 0)


def test_existing_state_days_propagates_fs_errors(spark, tmp_path, monkeypatch):
    """A transient filesystem fault must FAIL the run, not reclassify
    every day as first-run (which would zero real alert state)."""
    import pytest

    from tg_reporting_etl_spark.runner import state as st
    from tg_reporting_etl_spark.sources import writers

    def boom(*a, **kw):
        raise RuntimeError("transient fs outage")

    monkeypatch.setattr(writers, "_fs_path", boom)
    with pytest.raises(RuntimeError, match="transient fs outage"):
        st._existing_state_days(spark, str(tmp_path / "s"), [D])


def test_rtp_merge_days_rejects_missing_old_state(spark):
    """state_days non-empty + old_state=None is a caller bug — merging
    against nothing would re-init a day asserted to have history."""
    import pytest

    from tg_reporting_etl_spark.operators.risk_ctrl_rtp import rtp_batch_days, rtp_merge_days

    batch = rtp_batch_days(_hours(spark, 60_000.0), [D])
    with pytest.raises(ValueError, match="state_days is non-empty but old_state is None"):
        rtp_merge_days(None, batch, dt.datetime(2023, 1, 10, 12, 0), state_days=[D])


def test_has_rows_probe(spark):
    df = spark.range(5)
    assert has_rows(df)
    assert not has_rows(df.filter(F.col("id") < 0))


def test_rtp_multi_day_backfill_single_merge(spark, tmp_path, monkeypatch):
    """A contiguous multi-day backfill runs as ONE merge_into call and
    produces exactly the per-day sequential result — including mixed
    state: a day with an existing snapshot takes the merge branch
    (alert fires) while a never-seen day takes first-run init."""
    from tg_reporting_etl_spark.runner import state as st
    from tg_reporting_etl_spark.sources import writers

    def hours(day, profit, n=12):
        rows = [("UFA", "TG", "p1", "01", "THB", day, 1000.0, profit / n) for _ in range(n)]
        return spark.createDataFrame(rows, KEYS_COLS)

    days = [20230110, 20230111, 20230112]
    src = hours(days[0], 60_000.0).unionAll(hours(days[1], 60_000.0)).unionAll(
        hours(days[2], 10.0)
    )

    # seed day 0 only, so the backfill sees mixed state
    st.run_rtp_day(spark, src, days[0], dt.datetime(2023, 1, 10, 12, 0), str(tmp_path / "s"))

    calls = []
    orig = writers.merge_into

    def counting_merge(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(writers, "merge_into", counting_merge)
    out = st.run_rtp_days(
        spark, src, days, dt.datetime(2023, 1, 10, 12, 5), str(tmp_path / "s")
    )
    assert len(calls) == 1  # O(1) merges for the whole range

    rows = {r.summary_date: r for r in out.collect()}
    assert set(rows) == set(days)
    # day 0 had state: merge branch ran throttle/cap, alert fired
    assert (rows[days[0]].alert_count, rows[days[0]].send_alert) == (1, 1)
    # day 1 never seen: first-run init (no alert despite risky)
    assert (rows[days[1]].alert_count, rows[days[1]].send_alert) == (0, 1)
    assert rows[days[1]].last_alert_time == dt.datetime(1970, 1, 1)
    # day 2 calm: not risky, no alert machinery
    assert (rows[days[2]].is_risky, rows[days[2]].send_alert) == (0, 0)

    # equivalence: sequential per-day driver loop on a fresh dir
    st.run_rtp_day(spark, src, days[0], dt.datetime(2023, 1, 10, 12, 0), str(tmp_path / "q"))
    seq = {}
    for dk in days:
        r = st.run_rtp_day(
            spark, src, dk, dt.datetime(2023, 1, 10, 12, 5), str(tmp_path / "q")
        ).filter(F.col("summary_date") == dk).first()
        seq[dk] = r
    for dk in days:
        a, b = rows[dk], seq[dk]
        assert (a.alert_count, a.send_alert, a.is_risky, a.last_alert_time) == (
            b.alert_count, b.send_alert, b.is_risky, b.last_alert_time
        ), dk
