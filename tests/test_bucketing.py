"""Bucketed co-located join: the shuffle-free big-join strategy.

At 100 TB the fact-fact joins (e.g. profit x transfers per player) are
the expensive shuffles; bucketing both sides on the join key at write
time lets every later join run with zero Exchange.  This test pins that
the engine's write/read path actually produces a shuffle-free plan.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyspark.sql.functions as F

from tg_reporting_etl_spark.adapters import testdata as td


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # warehouse dir is static config; the session default (cwd
    # spark-warehouse) is fine for a temp table pair.  A fresh session's
    # metastore doesn't know about table dirs left behind by a previous
    # run, so DROP TABLE alone can no-op while saveAsTable still refuses
    # the existing LOCATION — clear both layers explicitly.
    spark.sql("DROP TABLE IF EXISTS b_profit")
    spark.sql("DROP TABLE IF EXISTS b_trans")
    warehouse = Path(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"))
    for tbl in ("b_profit", "b_trans"):
        shutil.rmtree(warehouse / tbl, ignore_errors=True)

    ppl = td.player_profit_log(spark, sf_dir).select("player_name", "bet", "profit")
    pvl = td.player_value_log_lineitem(spark, sf_dir).select("player_name", "value")
    ppl.write.bucketBy(8, "player_name").sortBy("player_name").mode("overwrite").saveAsTable("b_profit")
    pvl.write.bucketBy(8, "player_name").sortBy("player_name").mode("overwrite").saveAsTable("b_trans")

    a = spark.table("b_profit").groupBy("player_name").agg(F.sum("bet").alias("b"))
    b = spark.table("b_trans").groupBy("player_name").agg(F.sum("value").alias("v"))
    joined = a.join(b, "player_name")

    plan = joined._sc._jvm.PythonSQLUtils.explainString(joined._jdf.queryExecution(), "simple")
    # bucketed on the join/group key -> no shuffle exchange anywhere
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() > 0
