"""Streaming stateful rtp alerts: state carried across micro-batches."""

from __future__ import annotations

from tg_reporting_etl_spark.streaming.stateful import streaming_rtp_alerts

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
