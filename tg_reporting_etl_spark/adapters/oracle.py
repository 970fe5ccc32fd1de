"""DuckDB CTE twins of adapters.testdata.

Each constant below is a named CTE body that derives the same
reference-shaped table as the matching function in ``adapters.testdata``,
expression-for-expression.  Oracle SQL for a query is assembled as
``WITH <needed ctes> <query body>`` by :func:`with_ctes`.

These run ONLY in DuckDB (the driver's oracle); the Spark side never
parses them.  Keep in lockstep with adapters/testdata.py.
"""

from __future__ import annotations

_PLATFORM = "CASE WHEN {k} % 2 = 0 THEN 'UFA' ELSE 'GEA' END"
_SITE = "CASE {k} % 3 WHEN 0 THEN 'TG' WHEN 1 THEN 'UAT' ELSE 'TEST' END"
_COUNTRY = "CASE {k} % 4 WHEN 0 THEN 'THB' WHEN 1 THEN 'VND2' WHEN 2 THEN 'INR' ELSE 'PHP' END"

PLAYER_VALUE_LOG = f"""
player_value_log AS (
  SELECT
    {_PLATFORM.format(k='user_id')} AS platform,
    {_SITE.format(k='user_id')} AS site_code,
    printf('p%05d', user_id % 1000) AS player_name,
    {_COUNTRY.format(k='user_id')} AS country,
    CASE WHEN event_type IN ('purchase','signup') THEN 'IN' ELSE 'OUT' END AS trade_type,
    value AS value,
    value * 10 + (event_id % 100) AS before_value,
    CASE WHEN event_type IN ('purchase','signup')
         THEN (value * 10 + (event_id % 100)) + value
         ELSE (value * 10 + (event_id % 100)) - value - (event_id % 7) * 0.5
    END AS after_value,
    year(ts) * 10000 + month(ts) * 100 + day(ts) AS trade_date,
    CASE WHEN event_type = 'error' THEN 'FAIL' ELSE 'SUCCESS' END AS trade_status,
    ts AS trade_time
  FROM events
)"""

PLAYER_VALUE_LOG_LI = f"""
player_value_log_li AS (
  SELECT
    {_PLATFORM.format(k='l_suppkey')} AS platform,
    {_SITE.format(k='l_partkey')} AS site_code,
    printf('p%05d', l_orderkey % 300) AS player_name,
    {_COUNTRY.format(k='l_orderkey')} AS country,
    CASE WHEN l_returnflag = 'N' THEN 'IN' ELSE 'OUT' END AS trade_type,
    l_extendedprice * 0.5 AS value,
    l_extendedprice * 12 + l_linenumber AS before_value,
    CASE WHEN l_returnflag = 'N'
         THEN (l_extendedprice * 12 + l_linenumber) + l_extendedprice * 0.5
         ELSE (l_extendedprice * 12 + l_linenumber) - l_extendedprice * 0.5 - (l_suppkey % 5) * 0.25
    END AS after_value,
    year(l_shipdate) * 10000 + month(l_shipdate) * 100 + day(l_shipdate) AS trade_date,
    CASE WHEN l_linenumber % 11 = 0 THEN 'FAIL' ELSE 'SUCCESS' END AS trade_status,
    l_shipdate AS trade_time
  FROM lineitem
)"""

PLAYER_PROFIT_LOG = f"""
player_profit_log AS (
  SELECT
    {_PLATFORM.format(k='l_suppkey')} AS platform,
    {_SITE.format(k='l_partkey')} AS site_code,
    printf('%02d', l_partkey % 5 + 1) AS game_code,
    printf('p%05d', l_orderkey % 300) AS player_name,
    {_COUNTRY.format(k='l_orderkey')} AS country,
    l_extendedprice AS bet,
    l_extendedprice * (1 - l_discount) AS win,
    l_tax * 10 AS fee,
    l_extendedprice * (1 - l_discount) - l_extendedprice
      + CASE WHEN l_linenumber % 3 = 0 THEN l_quantity * 5 ELSE 0.0 END AS profit,
    CASE WHEN l_returnflag = 'R' THEN l_extendedprice * 0.1 ELSE 0.0 END AS refund,
    l_quantity * 2 AS normal_value,
    l_tax * 100 AS bonus_value,
    l_quantity - 25 AS free_value,
    l_discount * 100 - 5 AS jp_value,
    l_extendedprice AS valid_value,
    CASE WHEN l_linestatus = 'O' AND l_linenumber % 7 = 0 THEN l_quantity ELSE 0.0 END AS cancel_value,
    l_shipdate AS round_time,
    CASE WHEN l_orderkey % 20 = 0 THEN 1 ELSE 0 END AS is_robot
  FROM lineitem
)"""

GAME_SITES = f"""
game_sites AS (
  SELECT platform, code, min(ratio) AS ratio
  FROM (
    SELECT
      {_PLATFORM.format(k='n_nationkey')} AS platform,
      {_SITE.format(k='n_nationkey')} AS code,
      (n_nationkey % 10) / 10.0 AS ratio
    FROM nation
  )
  WHERE NOT (platform = 'GEA' AND code = 'TEST')
  GROUP BY platform, code
)"""

PLAYER = f"""
player AS (
  SELECT player_name, platform, site_code, reg_time, type, status
  FROM (
    SELECT
      printf('p%05d', c_custkey % 300) AS player_name,
      {_PLATFORM.format(k='c_custkey')} AS platform,
      {_SITE.format(k='c_custkey')} AS site_code,
      TIMESTAMP '1995-01-01 00:00:00' + INTERVAL (c_custkey % 2000) DAY AS reg_time,
      CASE WHEN c_custkey % 5 = 0 THEN 'ROBOT' ELSE 'NORMAL' END AS type,
      CASE WHEN c_custkey % 7 = 0 THEN 'DISABLED' ELSE 'ACTIVATE' END AS status,
      row_number() OVER (PARTITION BY printf('p%05d', c_custkey % 300) ORDER BY c_custkey) AS _rn
    FROM customer
  )
  WHERE _rn = 1
)"""

PLAYER_DAILY_RANKING = f"""
player_daily_ranking AS (
  SELECT
    CAST(o_orderdate AS DATE) AS state_date,
    {_PLATFORM.format(k='o_custkey')} AS platform,
    {_SITE.format(k='o_custkey')} AS site_code,
    printf('%02d', o_orderkey % 5 + 1) AS game_code,
    CASE WHEN o_orderkey % 2 = 0 THEN '1001' ELSE '1002' END AS room_type,
    {_COUNTRY.format(k='o_custkey')} AS country,
    printf('p%05d', o_custkey % 300) AS player_name,
    o_totalprice - 100000.0 AS win,
    o_custkey % 10 = 0 AS is_robot
  FROM orders
)"""

_CTES = {
    "player_value_log": PLAYER_VALUE_LOG,
    "player_value_log_li": PLAYER_VALUE_LOG_LI,
    "player_profit_log": PLAYER_PROFIT_LOG,
    "game_sites": GAME_SITES,
    "player": PLAYER,
    "player_daily_ranking": PLAYER_DAILY_RANKING,
}


def with_ctes(body: str, *names: str, extra: list[str] | None = None) -> str:
    """Assemble ``WITH a AS (...), b AS (...) <body>``.

    ``names`` pick from the adapter CTEs above; ``extra`` appends
    caller-supplied raw ``x AS (...)`` strings after them.
    """
    parts = [_CTES[n].strip() for n in names] + [e.strip() for e in (extra or [])]
    return "WITH " + ",\n".join(parts) + "\n" + body
