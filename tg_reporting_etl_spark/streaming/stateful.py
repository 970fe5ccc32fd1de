"""ST5 as a native streaming stateful operator.

The batch engine runs the rtp alert lifecycle as snapshot merges
(operators/risk_ctrl_rtp.py).  This module is the streaming form: keyed
state (alert_count, last_alert_epoch) carried across micro-batches by
``applyInPandasWithState`` — the reference's DB-backed alert throttling
(risk_ctrl_rtp_1d.py:172-194) without a DB.

Clock: the event-time high-water mark of each batch (max now_ts column),
not wall clock, so tests and replays are deterministic — the same
discipline as the injectable ``now`` in the batch operator.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tg_reporting_etl_spark.config import RISK_CTRL_1D

KEYS = ["platform", "site_code", "player_name", "game_code", "country"]

OUTPUT_SCHEMA = (
    "platform string, site_code string, player_name string, game_code string, country string, "
    "b_count long, b_cur double, p_cur double, rtp_cur double, "
    "is_risky int, send_alert int, alert_count long, last_alert_epoch long"
)
STATE_SCHEMA = "alert_count long, last_alert_epoch long"


def _alert_step(
    key: tuple[str, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cfg = RISK_CTRL_1D["rtp"]
    pdf = pd.concat(list(pdfs))
    b_count = int(pdf["b_amount"].count())
    b_cur = float(pdf["b_amount"].sum())
    p_cur = float(pdf["profit_amount"].sum())
    rtp_cur = p_cur / b_cur if b_cur != 0 else 0.0
    now_epoch = int(pdf["now_epoch"].max())

    risky = int(
        (
            p_cur >= cfg["profit_threshold"]
            and b_count >= cfg["bet_count_threshold"]
            and rtp_cur >= cfg["rtp_threshold"]
        )
        or p_cur >= cfg["profit_unconditional"]
    )
    first_run = not state.exists
    alert_count, last_alert = (0, 0) if first_run else state.get

    send = risky
    if not risky:
        alert_count, last_alert = 0, 0
    elif first_run:
        # batch-twin parity (operators/risk_ctrl_rtp.py rtp_merge,
        # reference risk_ctrl_rtp_1d.py:129-135): a key's FIRST run
        # sends without counting or stamping — so the next alert may
        # fire immediately, same quirk as the batch lifecycle.
        pass
    else:
        if (now_epoch - last_alert) / 60.0 < cfg["time_to_alert_minutes"] and last_alert > 0:
            send = 0
        if send and alert_count >= cfg["alert_limit"]:
            send = 0
        if send:
            alert_count += 1
            last_alert = now_epoch
    state.update((alert_count, last_alert))

    yield pd.DataFrame(
        [
            {
                **dict(zip(KEYS, key)),
                "b_count": b_count,
                "b_cur": b_cur,
                "p_cur": p_cur,
                "rtp_cur": rtp_cur,
                "is_risky": risky,
                "send_alert": int(send),
                "alert_count": alert_count,
                "last_alert_epoch": last_alert,
            }
        ]
    )


def streaming_rtp_alerts(hourly_rows: DataFrame) -> DataFrame:
    """hourly summary stream -> per-key alert decisions with carried state.

    Input columns: KEYS + b_amount, profit_amount, now_epoch (event-time
    clock).  Output mode: update (one row per key per batch).
    """
    return hourly_rows.groupBy(*KEYS).applyInPandasWithState(
        _alert_step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------- as-of enrich

ASOF_INPUT_SCHEMA = "key long, ts timestamp, side string, rid long, val double"
ASOF_OUTPUT_SCHEMA = "key long, ts timestamp, rid long, r_ts timestamp, r_val double"
_ASOF_STATE_SCHEMA = "r_ts array<long>, r_val array<double>"


def _make_asof_step(retention_seconds: int):
    """Per-key micro-batch step factory for the streaming as-of enrich:
    state holds the retained right rows (epoch-micros + value arrays);
    each left row is answered with the latest right at-or-before it
    (binary search, inclusive ties); rights below the retention horizon
    of the key's event-time high-water mark are pruned."""
    retention_us = int(retention_seconds) * 1_000_000

    def _step(key, pdfs, state):
        import numpy as np

        pdf = pd.concat(list(pdfs))
        ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us

        r_ts, r_val = state.get if state.exists else ((), ())
        is_r = (pdf["side"] == "R").to_numpy()
        all_ts = np.concatenate(
            [np.asarray(r_ts, dtype="int64"), ts_us.to_numpy()[is_r]]
        )
        all_val = np.concatenate(
            [np.asarray(r_val, dtype="float64"), pdf["val"].to_numpy()[is_r]]
        )
        order = np.argsort(all_ts, kind="stable")
        all_ts, all_val = all_ts[order], all_val[order]

        left = pdf[~is_r]
        if len(left):
            out = pd.DataFrame(
                {
                    "key": left["key"].to_numpy(),
                    "ts": left["ts"].to_numpy(),
                    "rid": left["rid"].to_numpy(),
                }
            )
            if len(all_ts):
                lts = ts_us.to_numpy()[~is_r]
                idx = np.searchsorted(all_ts, lts, side="right") - 1
                ok = idx >= 0
                safe = np.maximum(idx, 0)
                out["r_ts"] = pd.Series(
                    pd.to_datetime(all_ts[safe], unit="us")
                ).where(pd.Series(ok)).to_numpy()
                out["r_val"] = np.where(ok, all_val[safe], np.nan)
            else:
                out["r_ts"] = pd.NaT
                out["r_val"] = np.nan
            yield out

        if len(all_ts):
            horizon = int(ts_us.max()) - retention_us
            keep = all_ts >= horizon
            state.update((all_ts[keep].tolist(), all_val[keep].tolist()))

    return _step


def streaming_asof_enrich(unified: DataFrame, retention_seconds: int = 3600) -> DataFrame:
    """Streaming twin of functions/asof.py:asof_join_backward over a
    SINGLE tagged stream (side 'L' = rows to enrich, 'R' = state
    rows): every left row is answered with the latest right row of the
    same key at or before its event time.

    State per key is the retained right rows — bounded by
    ``retention_seconds`` of the key's event-time high-water mark, the
    same horizon contract as dropDuplicatesWithinWatermark: a left row
    arriving more than the retention behind the rights it needs may
    miss them.  Within the horizon, out-of-order LEFT rows across
    batches still match exactly (binary search over retained rights);
    a RIGHT row arriving after a left row was already emitted cannot
    retro-correct it (streaming emits once — the batch twin is the
    replayable ground truth).

    Clock: per-key event time, never wall clock — deterministic under
    replay, like the alert throttler above."""
    return unified.groupBy("key").applyInPandasWithState(
        _make_asof_step(retention_seconds),
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=_ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
