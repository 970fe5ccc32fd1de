"""Deterministic mapping: driver testdata -> reference-shaped tables.

The reference engine's facts/dimensions (FIXTURES.md §A, inferred from
the SQL in /root/reference) do not exist in the driver testdata, so each
is *derived* from a TPC-H-ish table with pure, deterministic column
expressions (no randomness, no data movement):

- ``player_value_log``   <- events     (wallet-transfer fact;
  reference reader: task-executor/trans_summary/trans_summary_5min.py:54,67-89)
- ``player_profit_log``  <- lineitem   (bet-round fact;
  reference reader: task-executor/player_summary/player_summary_5min.py:58,71-99)
- ``game_sites``         <- nation     (revenue-share dim;
  reference reader: player_summary_5min.py:109-113)
- ``player``             <- customer   (player dim;
  reference reader: new_rigester_summary/new_register_summary_1d.py:65-75)
- ``player_daily_ranking``<- orders    (ranking fact;
  reference reader: player_ranking/player_ranking_1d_vnd_ou_leaderboard.py:221-234)

Every expression here has a byte-identical twin in ``adapters.oracle``
(DuckDB CTE SQL).  The driver's hash compare is the contract that the two
renderings agree — change them only in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tg_reporting_etl_spark.sources.readers import load_table

PLATFORMS = ("UFA", "GEA")
SITE_CODES = ("TG", "UAT", "TEST")
COUNTRIES = ("THB", "VND2", "INR", "PHP")


def _pick(key: Column, values: tuple[str, ...]) -> Column:
    """values[key % len(values)] as a CASE expression (JVM-side)."""
    k = key % len(values)
    expr = F.when(k == 0, F.lit(values[0]))
    for i, v in enumerate(values[1:], start=1):
        expr = expr.when(k == i, F.lit(v))
    return expr


def player_value_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wallet-transfer fact derived from ``events``.

    Column semantics follow trans_summary_5min.py:67-89: trade_type IN/OUT,
    only SUCCESS rows counted, before/after balances with an occasional
    nonzero loss component (Σbefore − Σafter − Σvalue ≠ 0 on OUT rows).
    """
    ev = load_table(spark, sf_dir, "events")
    before = ev.value * 10 + (ev.event_id % 100)
    is_in = ev.event_type.isin("purchase", "signup")
    return ev.select(
        _pick(ev.user_id, PLATFORMS).alias("platform"),
        _pick(ev.user_id, SITE_CODES).alias("site_code"),
        F.format_string("p%05d", (ev.user_id % 1000).cast("int")).alias("player_name"),
        _pick(ev.user_id, COUNTRIES).alias("country"),
        F.when(is_in, "IN").otherwise("OUT").alias("trade_type"),
        ev.value.alias("value"),
        before.alias("before_value"),
        F.when(is_in, before + ev.value)
        .otherwise(before - ev.value - (ev.event_id % 7) * 0.5)
        .alias("after_value"),
        (F.year(ev.ts) * 10000 + F.month(ev.ts) * 100 + F.dayofmonth(ev.ts)).alias("trade_date"),
        F.when(ev.event_type == "error", "FAIL").otherwise("SUCCESS").alias("trade_status"),
        ev.ts.alias("trade_time"),
    )


def player_value_log_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wallet-transfer fact on the *lineitem* time axis (1995-2001).

    The events-derived wallet log lives in 2024-01 while the bet-round
    fact lives in 1995-2001; risk_ctrl joins the two families per day
    (risk_ctrl_player_1d.py:86-95,143-148), so a second transfer fact is
    derived from lineitem with key derivations matching
    :func:`player_profit_log` (same platform/site/player/country per row
    domain) and trade_time = l_shipdate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    value = li.l_extendedprice * 0.5
    before = li.l_extendedprice * 12 + li.l_linenumber
    is_in = li.l_returnflag == "N"
    return li.select(
        _pick(li.l_suppkey, PLATFORMS).alias("platform"),
        _pick(li.l_partkey, SITE_CODES).alias("site_code"),
        F.format_string("p%05d", (li.l_orderkey % 300).cast("int")).alias("player_name"),
        _pick(li.l_orderkey, COUNTRIES).alias("country"),
        F.when(is_in, "IN").otherwise("OUT").alias("trade_type"),
        value.alias("value"),
        before.alias("before_value"),
        F.when(is_in, before + value)
        .otherwise(before - value - (li.l_suppkey % 5) * 0.25)
        .alias("after_value"),
        (F.year(li.l_shipdate) * 10000 + F.month(li.l_shipdate) * 100 + F.dayofmonth(li.l_shipdate)).alias(
            "trade_date"
        ),
        F.when(li.l_linenumber % 11 == 0, "FAIL").otherwise("SUCCESS").alias("trade_status"),
        li.l_shipdate.alias("trade_time"),
    )


def player_profit_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bet-round fact derived from ``lineitem``.

    Measures follow player_summary_5min.py:77-88; free/jp values include
    negatives so the clamped sums SUM(IF(x>=0,x,0)) are exercised
    (player_summary_5min.py:85-86), and ~5% of rows are robots
    (is_robot=1, filtered by :94).
    """
    li = load_table(spark, sf_dir, "lineitem")
    bet = li.l_extendedprice
    win = li.l_extendedprice * (1 - li.l_discount)
    return li.select(
        _pick(li.l_suppkey, PLATFORMS).alias("platform"),
        _pick(li.l_partkey, SITE_CODES).alias("site_code"),
        F.format_string("%02d", (li.l_partkey % 5 + 1).cast("int")).alias("game_code"),
        F.format_string("p%05d", (li.l_orderkey % 300).cast("int")).alias("player_name"),
        _pick(li.l_orderkey, COUNTRIES).alias("country"),
        bet.alias("bet"),
        win.alias("win"),
        (li.l_tax * 10).alias("fee"),
        (win - bet + F.when(li.l_linenumber % 3 == 0, li.l_quantity * 5).otherwise(0.0)).alias("profit"),
        F.when(li.l_returnflag == "R", li.l_extendedprice * 0.1).otherwise(0.0).alias("refund"),
        (li.l_quantity * 2).alias("normal_value"),
        (li.l_tax * 100).alias("bonus_value"),
        (li.l_quantity - 25).alias("free_value"),
        (li.l_discount * 100 - 5).alias("jp_value"),
        li.l_extendedprice.alias("valid_value"),
        F.when((li.l_linestatus == "O") & (li.l_linenumber % 7 == 0), li.l_quantity)
        .otherwise(0.0)
        .alias("cancel_value"),
        li.l_shipdate.alias("round_time"),
        F.when(li.l_orderkey % 20 == 0, 1).otherwise(0).alias("is_robot"),
    )


def game_sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site revenue-share dimension derived from ``nation`` (6 rows max).

    One (platform, code) combo is deliberately left out so the left join's
    fillna(0) path is exercised (player_summary_5min.py:119,122-123).
    Small by construction -> always broadcast.
    """
    na = load_table(spark, sf_dir, "nation")
    base = na.select(
        _pick(na.n_nationkey, PLATFORMS).alias("platform"),
        _pick(na.n_nationkey, SITE_CODES).alias("code"),
        ((na.n_nationkey % 10) / 10.0).alias("ratio"),
    )
    return (
        base.filter(~((F.col("platform") == "GEA") & (F.col("code") == "TEST")))
        .groupBy("platform", "code")
        .agg(F.min("ratio").alias("ratio"))
    )


def player(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Player dimension derived from ``customer``.

    reg_time spreads registrations across the lineitem date range so the
    new-register day windows have members (new_register_summary_1d.py:71);
    type NORMAL/ROBOT and status ACTIVATE/DISABLED follow the leaderboard
    roster filters (player_ranking_1d_vnd_ou_leaderboard.py:124-125).
    Deduped to one row per player_name (min custkey wins).
    """
    cu = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window as W

    base = cu.select(
        cu.c_custkey.alias("c_custkey"),
        F.format_string("p%05d", (cu.c_custkey % 300).cast("int")).alias("player_name"),
        _pick(cu.c_custkey, PLATFORMS).alias("platform"),
        _pick(cu.c_custkey, SITE_CODES).alias("site_code"),
        F.expr("timestamp'1995-01-01 00:00:00' + make_interval(0, 0, 0, cast(c_custkey % 2000 as int), 0, 0, 0)").alias(
            "reg_time"
        ),
        F.when(cu.c_custkey % 5 == 0, "ROBOT").otherwise("NORMAL").alias("type"),
        F.when(cu.c_custkey % 7 == 0, "DISABLED").otherwise("ACTIVATE").alias("status"),
    )
    rn = F.row_number().over(W.partitionBy("player_name").orderBy("c_custkey"))
    return base.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn", "c_custkey")


def player_daily_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-player daily ranking fact derived from ``orders``.

    win includes negatives so the leaderboard's max<=0 path exists
    (player_ranking_1d_vnd_ou_leaderboard.py:244-248).
    """
    od = load_table(spark, sf_dir, "orders")
    return od.select(
        od.o_orderdate.cast("date").alias("state_date"),
        _pick(od.o_custkey, PLATFORMS).alias("platform"),
        _pick(od.o_custkey, SITE_CODES).alias("site_code"),
        F.format_string("%02d", (od.o_orderkey % 5 + 1).cast("int")).alias("game_code"),
        F.when(od.o_orderkey % 2 == 0, "1001").otherwise("1002").alias("room_type"),
        _pick(od.o_custkey, COUNTRIES).alias("country"),
        F.format_string("p%05d", (od.o_custkey % 300).cast("int")).alias("player_name"),
        (od.o_totalprice - 100000.0).alias("win"),
        (od.o_custkey % 10 == 0).alias("is_robot"),
    )
