"""Structured Streaming 5-min tier: batch parity + late-data update mode."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.operators.trans_summary import GROUP_KEYS, trans_summary_5min
from tg_reporting_etl_spark.streaming.pipeline import (
    start_memory_sink,
    streaming_trans_summary_5min,
)

GTE, LT = "2024-01-01 00:00:00", "2024-02-01 00:00:00"


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    """Replaying the wallet log through the streaming plan reproduces the
    batch tier exactly (same measure expressions, two runtimes)."""
    pvl = td.player_value_log(spark, sf_dir)
    src = str(tmp_path / "stream_src")
    pvl.write.parquet(src)

    stream = spark.readStream.schema(pvl.schema).parquet(src)
    q = start_memory_sink(streaming_trans_summary_5min(stream), "t5_stream", mode="complete")
    try:
        q.processAllAvailable()
        got = (
            spark.sql("SELECT * FROM t5_stream")
            .withColumn("n", F.col("trans_in_count") + F.col("trans_out_count"))
            .agg(F.sum("n"), F.count("*"))
            .first()
        )
    finally:
        q.stop()
    want = (
        trans_summary_5min(pvl, GTE, LT)
        .withColumn("n", F.col("trans_in_count") + F.col("trans_out_count"))
        .agg(F.sum("n"), F.count("*"))
        .first()
    )
    assert tuple(got) == tuple(want)


def test_late_data_updates_window(spark, sf_dir, tmp_path):
    """ST2/ST3: a late event re-emits its (already emitted) window with
    updated counts — the streaming form of the rerun cascade."""
    pvl = td.player_value_log(spark, sf_dir).limit(0)
    schema = pvl.schema
    src = str(tmp_path / "late_src")
    os.makedirs(src, exist_ok=True)

    def rows_df(ts, value):
        import datetime as dt

        return spark.createDataFrame(
            [
                (
                    "UFA", "TG", "p00001", "THB", "IN",
                    value, 0.0, 0.0, 20240105, "SUCCESS",
                    dt.datetime.fromisoformat(ts),
                )
            ],
            schema,
        )

    rows_df("2024-01-05 10:01:00", 10.0).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_memory_sink(streaming_trans_summary_5min(stream), "late_stream", mode="update")
    try:
        q.processAllAvailable()
        first = spark.sql(
            "SELECT sum(trans_in_amount) v FROM late_stream WHERE start_time = '2024-01-05 10:00:00'"
        ).first().v
        # late event for the SAME 5-min window arrives in a later batch
        rows_df("2024-01-05 10:02:00", 5.0).write.mode("append").parquet(src)
        q.processAllAvailable()
        emissions = spark.sql(
            "SELECT trans_in_amount FROM late_stream WHERE start_time = '2024-01-05 10:00:00' ORDER BY trans_in_amount"
        ).collect()
    finally:
        q.stop()
    assert first == 10.0
    # update mode re-emitted the window: first emission 10, corrected emission 15
    assert [r.trans_in_amount for r in emissions] == [10.0, 15.0]
