"""Streaming stateful rtp alerts: state carried across micro-batches."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from tg_reporting_etl_spark.streaming.stateful import KEYS, streaming_rtp_alerts

COLS = (
    "platform string, site_code string, player_name string, game_code string, "
    "country string, b_amount double, profit_amount double, now_epoch long"
)


def _batch(spark, profit_per_row, now_epoch, n=12):
    rows = [("UFA", "TG", "p1", "01", "THB", 1000.0, profit_per_row, now_epoch) for _ in range(n)]
    return spark.createDataFrame(rows, COLS)


def test_alert_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # one file per append so each append is exactly one micro-batch
    _batch(spark, 5000.0, 1_000_000).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(_batch(spark, 0.0, 0).schema).parquet(src)
    q = (
        streaming_rtp_alerts(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("alerts")
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql("SELECT * FROM alerts").collect()
        # batch 2, 30 s later: NOT throttled — the first run sent
        # without stamping (batch-twin parity with rtp_merge's
        # reference-faithful first-run quirk), so this alert fires
        # and is the first to count + stamp
        _batch(spark, 5000.0, 1_000_030).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        second = spark.sql("SELECT * FROM alerts ORDER BY last_alert_epoch").collect()[-1]
        # batch 3, another 30 s later: inside the 1-minute window -> throttled
        _batch(spark, 5000.0, 1_000_060).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        third = spark.sql("SELECT * FROM alerts ORDER BY last_alert_epoch").collect()[-1]
    finally:
        q.stop()

    assert len(first) == 1
    # first run sends but does not count/stamp (reference :129-135)
    assert (first[0].is_risky, first[0].send_alert, first[0].alert_count) == (1, 1, 0)
    assert first[0].last_alert_epoch == 0
    assert (second.send_alert, second.alert_count) == (1, 1)
    assert second.last_alert_epoch == 1_000_030
    assert (third.send_alert, third.alert_count) == (0, 1)  # throttled, counter kept
    assert third.last_alert_epoch == 1_000_030

def test_streaming_replays_batch_rtp_scenario(spark, sf_dir, tmp_path):
    """End-to-end parity: the applyInPandasWithState operator driven with
    the risk_ctrl_rtp_1d oracle scenario's three micro-batches (partial
    day @T1, full day @T2, full day @T3=T2+30s) ends in the same state
    as the batch snapshot from run_rtp_scenario — per key: measures,
    risky/send flags, alert_count and which clock stamped the alert."""
    from tg_reporting_etl_spark.adapters import testdata as td
    from tg_reporting_etl_spark.operators.player_summary import (
        player_summary_1h,
        player_summary_5min,
    )
    from tg_reporting_etl_spark.operators.risk_ctrl_rtp import run_rtp_scenario
    from tg_reporting_etl_spark.plans.register_risk_plans import RISK_DAY, _D1_TS, _D_TS
    from tg_reporting_etl_spark.plans.rtp_plans import T1, T2, T3

    ppl = td.player_profit_log(spark, sf_dir)
    sites = td.game_sites(spark, sf_dir)

    def tier(src):
        return player_summary_1h(player_summary_5min(src, sites, _D_TS, _D1_TS)).select(
            *KEYS, "summary_date", "b_amount", "profit_amount"
        )

    # a guaranteed-risky key so the alert lifecycle is exercised even at
    # the smallest SF (profit >= profit_unconditional)
    whale = spark.createDataFrame(
        [("P1", "S1", "whale", "G1", "TW", RISK_DAY, 100.0, 60_000.0)],
        "platform string, site_code string, player_name string, game_code string, "
        "country string, summary_date int, b_amount double, profit_amount double",
    )
    b1 = tier(ppl.filter(ppl.jp_value >= 0)).unionByName(whale).cache()
    # batch-vs-streaming parity needs run 1's key set in every run: the
    # batch merge initializes ALL state at run 1 (first-run quirk is
    # global), the streaming operator per key
    keys1 = b1.select(*KEYS).distinct()
    full = tier(ppl).join(keys1, KEYS, "left_semi").unionByName(whale).cache()
    assert b1.count() > 0

    batch_final = {
        tuple(r[k] for k in KEYS): r
        for r in run_rtp_scenario([b1, full, full], RISK_DAY, [T1, T2, T3]).collect()
    }

    base = 1_000_000
    epoch_of = {T1: base, T2: base + int((T2 - T1).total_seconds()), T3: base + int((T3 - T1).total_seconds())}
    src = str(tmp_path / "replay_src")
    ckpt = str(tmp_path / "replay_ckpt")
    emissions: dict[tuple, list] = {}

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            emissions.setdefault(tuple(r[k] for k in KEYS), []).append((epoch_id, r))

    import os

    os.makedirs(src, exist_ok=True)
    first = b1.withColumn("now_epoch", F.lit(epoch_of[T1]).cast("long")).drop("summary_date")
    first.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(first.schema).parquet(src)
    q = (
        streaming_rtp_alerts(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        for t in (T2, T3):
            full.withColumn("now_epoch", F.lit(epoch_of[t]).cast("long")).drop(
                "summary_date"
            ).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()

    assert set(emissions) == set(batch_final)
    stamp_of = {dt.datetime(1970, 1, 1): 0, **{t: e for t, e in epoch_of.items()}}
    whale_key = ("P1", "S1", "whale", "G1", "TW")
    assert batch_final[whale_key].alert_count == 1  # alerted at T2, throttled at T3
    for key, batch_row in batch_final.items():
        stream_row = max(emissions[key], key=lambda t: t[0])[1]
        assert (
            stream_row.b_count,
            round(stream_row.b_cur, 6),
            round(stream_row.p_cur, 6),
            round(stream_row.rtp_cur, 6),
            stream_row.is_risky,
            stream_row.send_alert,
            stream_row.alert_count,
            stream_row.last_alert_epoch,
        ) == (
            batch_row.b_count,
            round(batch_row.b_cur, 6),
            round(batch_row.p_cur, 6),
            round(batch_row.rtp_cur, 6),
            batch_row.is_risky,
            batch_row.send_alert,
            batch_row.alert_count,
            stamp_of[batch_row.last_alert_time],
        ), key
    for df in (b1, full):
        df.unpersist()
