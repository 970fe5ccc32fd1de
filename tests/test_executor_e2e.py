"""End-to-end pipeline: mint tasks -> execute cascade -> verify tables.

The golden test of SURVEY §5.2-5.3: materialized tier tables written by
the executor equal direct aggregation from raw, and re-running the whole
board is a no-op (idempotent overwrite)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.runner.board import LEVELS
from tg_reporting_etl_spark.runner.executor import TransSummaryFamily, execute_board
from tg_reporting_etl_spark.runner.timeslice import expand_timeslices

G0, L0 = "2024-01-02 00:00:00", "2024-01-04 00:00:00"
NOW = "2024-02-01 00:00:00"


@pytest.fixture(scope="module")
def executed(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tables"))
    meta = spark.createDataFrame(
        [
            (G0, L0, "ALL", "ALL", "ALL", "trans_summary", f"trans_summary_{s}", f, LEVELS[f])
            for f, s in (("5min", "5min"), ("1H", "1h"), ("1D", "1d"))
        ],
        "gte_time string, lt_time string, platform string, site_code string, game_code string, "
        "report_class string, assignee string, freq_type string, level int",
    )
    meta = meta.withColumn("gte_time", F.col("gte_time").cast("timestamp")).withColumn(
        "lt_time", F.col("lt_time").cast("timestamp")
    )
    board = expand_timeslices(meta).withColumn("done", F.lit(0))
    family = TransSummaryFamily(td.player_value_log(spark, sf_dir), out)
    records = execute_board(spark, board, family, NOW)
    return {"family": family, "records": records, "board": board}


def test_all_closed_tasks_done(executed):
    assert executed["records"]
    assert all(r["done"] == 1 for r in executed["records"])
    assert all(r["runtime_second"] > 0 for r in executed["records"])


def test_materialized_1d_equals_direct(executed, spark, sf_dir):
    """Cascade through materialized parquet == one-shot day aggregation."""
    got = (
        executed["family"]
        .read_tier(spark, "1d")
        .groupBy("summary_date")
        .agg(
            F.round(F.sum("trans_in_amount"), 4).alias("in_amt"),
            F.sum("trans_in_count").alias("in_cnt"),
        )
    )
    pvl = td.player_value_log(spark, sf_dir)
    want = (
        pvl.filter(
            (pvl.trade_status == "SUCCESS") & (pvl.trade_time >= G0) & (pvl.trade_time < L0)
        )
        .groupBy((F.year("trade_time") * 10000 + F.month("trade_time") * 100 + F.dayofmonth("trade_time")).alias("summary_date"))
        .agg(
            F.round(F.sum(F.when(F.col("trade_type") == "IN", F.col("value")).otherwise(0.0)), 4).alias("in_amt"),
            F.sum(F.when(F.col("trade_type") == "IN", 1).otherwise(0)).alias("in_cnt"),
        )
    )
    g = {r.summary_date: (r.in_amt, r.in_cnt) for r in got.collect()}
    w = {r.summary_date: (r.in_amt, r.in_cnt) for r in want.collect()}
    assert g == w and len(g) == 2  # two full days


def test_rerun_is_idempotent(executed, spark):
    family = executed["family"]
    before = {t: family.read_tier(spark, t).count() for t in ("5min", "1h", "1d")}
    execute_board(spark, executed["board"], family, NOW)
    after = {t: family.read_tier(spark, t).count() for t in ("5min", "1h", "1d")}
    assert before == after


def test_intraday_incremental_preserves_earlier_windows(spark, sf_dir, tmp_path):
    """Steady-state case: two half-day runs == one full-day run.

    The 5min tier is partitioned at (summary_date, hours, mins), so the
    afternoon run's dynamic overwrite must NOT wipe the morning windows;
    and the 1h rollup's date bound must include the run day even when
    lt has a time-of-day component (lt-1s, inclusive)."""
    out = str(tmp_path / "tables")
    family = TransSummaryFamily(td.player_value_log(spark, sf_dir), out)
    day, noon, nxt = "2024-01-02 00:00:00", "2024-01-02 12:00:00", "2024-01-03 00:00:00"

    family.run_tier(spark, "5min", day, noon)
    morning = family.read_tier(spark, "5min").count()
    assert morning > 0
    n_1h_am = family.run_tier(spark, "1h", day, noon)
    assert n_1h_am > 0  # old exclusive bound made this 0 rows

    family.run_tier(spark, "5min", noon, nxt)
    family.run_tier(spark, "1h", noon, nxt)
    assert family.read_tier(spark, "5min").count() > morning  # morning survived

    # equivalence against a one-shot full-day run
    out2 = str(tmp_path / "tables_fullday")
    full = TransSummaryFamily(td.player_value_log(spark, sf_dir), out2)
    full.run_tier(spark, "5min", day, nxt)
    full.run_tier(spark, "1h", day, nxt)
    for tier in ("5min", "1h"):
        a = family.read_tier(spark, tier)
        b = full.read_tier(spark, tier)
        assert a.count() == b.count()
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
