"""risk_ctrl_rtp stateful merge: alert lifecycle with a frozen clock.

Covers first-run init (no throttle/cap), alert fire + increment,
1-minute throttle, 5-alert cap, and reset on not-risky
(risk_ctrl_rtp_1d.py:129-194).
"""

from __future__ import annotations

import datetime as dt

import pytest

from tg_reporting_etl_spark.operators.risk_ctrl_rtp import rtp_batch, rtp_merge

D = 20230110
KEYS = ["platform", "site_code", "player_name", "game_code", "country"]
COLS = [*KEYS, "summary_date", "b_amount", "profit_amount"]


def _hours(spark, profit: float, n_hours: int = 12):
    """1h-tier rows for one player: n_hours rows -> b_count = n_hours."""
    rows = [("UFA", "TG", "p1", "01", "THB", D, 1000.0, profit / n_hours) for _ in range(n_hours)]
    return spark.createDataFrame(rows, COLS)


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2023, 1, 10, 12, minute, second)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_first_run_flags_but_does_not_count(spark):
    s1 = rtp_merge(None, rtp_batch(_hours(spark, 60_000.0), D), _t(0))
    r = _one(s1)
    assert (r.is_risky, r.send_alert, r.alert_count) == (1, 1, 0)
    assert r.last_alert_time == dt.datetime(1970, 1, 1)


def test_alert_fires_then_throttles_then_caps(spark):
    batch = rtp_batch(_hours(spark, 60_000.0), D)
    state = rtp_merge(None, batch, _t(0))
    # run 2: epoch last_alert -> fires, count 1
    state = rtp_merge(state, batch, _t(1))
    r = _one(state)
    assert (r.send_alert, r.alert_count) == (1, 1)
    assert r.last_alert_time == _t(1)
    # run 3, 30 s later: throttled (< 1 minute)
    state2 = rtp_merge(state, batch, _t(1, 30))
    r = _one(state2)
    assert (r.send_alert, r.alert_count) == (0, 1)
    assert r.last_alert_time == _t(1)
    # runs every 2 minutes: counts to the cap of 5, then mutes
    for i in range(4):
        state = rtp_merge(state, batch, _t(3 + 2 * i))
    r = _one(state)
    assert (r.send_alert, r.alert_count) == (1, 5)
    state = rtp_merge(state, batch, _t(20))
    r = _one(state)
    assert (r.send_alert, r.alert_count) == (0, 5)  # capped


def test_reset_when_no_longer_risky(spark):
    risky = rtp_batch(_hours(spark, 60_000.0), D)
    calm = rtp_batch(_hours(spark, 10.0), D)
    state = rtp_merge(None, risky, _t(0))
    state = rtp_merge(state, risky, _t(1))
    state = rtp_merge(state, calm, _t(3))
    r = _one(state)
    assert (r.is_risky, r.send_alert, r.alert_count) == (0, 0, 0)
    assert r.last_alert_time == dt.datetime(1970, 1, 1)


def test_new_player_inserted_with_fresh_state(spark):
    b1 = rtp_batch(_hours(spark, 60_000.0), D)
    rows2 = [("UFA", "TG", "p2", "01", "THB", D, 500.0, 100.0)]
    b2_src = _hours(spark, 60_000.0).union(spark.createDataFrame(rows2, COLS))
    state = rtp_merge(None, b1, _t(0))
    state = rtp_merge(state, rtp_batch(b2_src, D), _t(2))
    rows = {r.player_name: r for r in state.collect()}
    assert set(rows) == {"p1", "p2"}
    assert rows["p2"].alert_count == 0
    assert rows["p2"].create_time == _t(2)
    assert rows["p1"].create_time == _t(0)


def test_risky_thresholds(spark):
    """profit>=10k AND hours>=10 AND rtp>=1 -> risky; few hours -> not."""
    few_hours = rtp_batch(_hours(spark, 20_000.0, n_hours=5), D)  # b_count=5 < 10
    r = _one(rtp_merge(None, few_hours, _t(0)))
    assert r.is_risky == 0  # 20k < 50k unconditional, count below threshold
    many_hours = rtp_batch(_hours(spark, 20_000.0, n_hours=12), D)
    r = _one(rtp_merge(None, many_hours, _t(0)))
    assert r.is_risky == 1  # rtp = 20000/12000 >= 1, count 12 >= 10


def test_long_scenario_chain_stays_analyzable(spark):
    """A 25-run update-mode chain must not blow the analyzer up
    (persist alone doubles the logical plan per run; the periodic lazy
    localCheckpoint bounds it) and must keep the cap/throttle
    invariants: alert_count never exceeds the limit and the final
    snapshot still has exactly one row per key."""
    from tg_reporting_etl_spark.config import RISK_CTRL_1D
    from tg_reporting_etl_spark.operators.risk_ctrl_rtp import run_rtp_scenario

    batch = _hours(spark, 60_000.0)
    runs = 25
    clocks = [_t(0) + dt.timedelta(minutes=40 * i) for i in range(runs)]
    final = run_rtp_scenario([batch] * runs, D, clocks)
    rows = final.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.alert_count == RISK_CTRL_1D["rtp"]["alert_limit"]
    assert r.send_alert == 0  # capped -> muted
