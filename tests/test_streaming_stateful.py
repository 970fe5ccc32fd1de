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


def test_streaming_asof_enrich_cross_batch(spark, tmp_path):
    """Streaming as-of: lefts match rights indexed by EARLIER batches;
    an out-of-order left still binary-searches the retained rights;
    results agree with the batch as-of twin on the union of batches."""
    import datetime as dt
    import os

    import pyspark.sql.functions as F

    from tg_reporting_etl_spark.streaming.stateful import (
        ASOF_INPUT_SCHEMA,
        streaming_asof_enrich,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def t(mins):
        return t0 + dt.timedelta(minutes=mins)

    src = str(tmp_path / "asof_src")
    os.makedirs(src, exist_ok=True)

    # batch 1: rights at 0 and 10 for key 1; right at 5 for key 2
    b1 = [
        (1, t(0), "R", 0, 100.0),
        (1, t(10), "R", 0, 110.0),
        (2, t(5), "R", 0, 200.0),
    ]
    # batch 2: lefts — in-order (key 1 @12), out-of-order (key 1 @3,
    # needs the @0 right, not the @10 one), unmatched (key 2 @4)
    b2 = [
        (1, t(12), "L", 901, 0.0),
        (1, t(3), "L", 902, 0.0),
        (2, t(4), "L", 903, 0.0),
    ]
    spark.createDataFrame(b1, ASOF_INPUT_SCHEMA).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.createDataFrame([], ASOF_INPUT_SCHEMA).schema
    ).parquet(src)
    out = streaming_asof_enrich(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("asof_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, ASOF_INPUT_SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = {r.rid: r for r in spark.sql("SELECT * FROM asof_sink").collect()}
    finally:
        q.stop()

    assert rows[901].r_val == 110.0 and rows[901].r_ts == t(10)
    assert rows[902].r_val == 100.0 and rows[902].r_ts == t(0)  # out-of-order left
    assert rows[903].r_val is None and rows[903].r_ts is None  # right is later

    # parity with the batch twin over the union
    from tg_reporting_etl_spark.functions.asof import asof_join_backward

    union = spark.createDataFrame(b1 + b2, ASOF_INPUT_SCHEMA)
    left = union.filter("side = 'L'").select("key", "ts", "rid")
    right = union.filter("side = 'R'").select("key", "ts", "val")
    batch = {
        r.rid: r
        for r in asof_join_backward(left, right, "key", right_prefix="r_").collect()
    }
    for rid in (901, 902, 903):
        assert batch[rid].r_val == rows[rid].r_val
        assert batch[rid].r_ts == rows[rid].r_ts


def test_streaming_asof_retention_prunes_state(spark, tmp_path):
    """Rights older than the retention horizon are pruned: a left
    arriving beyond the horizon reports no match (documented bound)."""
    import datetime as dt
    import os

    from tg_reporting_etl_spark.streaming.stateful import (
        ASOF_INPUT_SCHEMA,
        streaming_asof_enrich,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "asof_ret_src")
    os.makedirs(src, exist_ok=True)
    b1 = [(1, t0, "R", 0, 1.0)]
    # 2h later: beyond the 3600s retention; then the probe left
    b2 = [(1, t0 + dt.timedelta(hours=2), "R", 0, 2.0)]
    b3 = [(1, t0 + dt.timedelta(minutes=1), "L", 900, 0.0)]
    spark.createDataFrame(b1, ASOF_INPUT_SCHEMA).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.createDataFrame([], ASOF_INPUT_SCHEMA).schema
    ).parquet(src)
    q = (
        streaming_asof_enrich(stream, retention_seconds=3600)
        .writeStream.format("memory")
        .queryName("asof_ret_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, ASOF_INPUT_SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        spark.createDataFrame(b3, ASOF_INPUT_SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = {r.rid: r for r in spark.sql("SELECT * FROM asof_ret_sink").collect()}
    finally:
        q.stop()
    # the t0 right was pruned when the 2h right advanced the horizon,
    # so the late left (t0+1min) finds nothing at-or-before it
    assert rows[900].r_val is None


def test_asof_catalog_row_survives_non_arrow_session(spark, sf_dir):
    """The driver runs a VANILLA SparkSession (no Arrow): a nullable
    long column rebuilt from pandas lands as float64-with-NaN there,
    and the non-Arrow createDataFrame verifier rejects floats for
    LongType.  r14 found streaming_asof_enrich failing exactly this way
    (click_event_id is NULL for purchases with no prior click); the row
    must normalize to int-or-None so it is session-config-agnostic."""
    from tg_reporting_etl_spark.plans.catalog import queries

    arrow_key = "spark.sql.execution.arrow.pyspark.enabled"
    old = spark.conf.get(arrow_key)
    spark.conf.set(arrow_key, "false")
    try:
        rows = queries()["streaming_asof_enrich"](spark, sf_dir).collect()
    finally:
        spark.conf.set(arrow_key, old)
    assert rows
    # the nullable path itself must be exercised, or this test is vacuous
    assert any(r.click_event_id is None for r in rows)
    assert any(r.click_event_id is not None for r in rows)
