"""Leaderboard query + DuckDB oracle (SURVEY §2: W1 W2 O3 O4 P8 G2 F9 J6-ish).

The md5-hash randomness (see operators.leaderboard) is replayed
verbatim in SQL: DuckDB's md5 == Spark's md5, and
``CAST('0x'||substr(md5(s),1,8) AS BIGINT)`` == ``conv(substr(md5(s),1,8),16,10)``.
Spark's double->long cast truncates toward zero, DuckDB's rounds — hence
``trunc()`` before every integer cast here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tg_reporting_etl_spark.adapters import oracle as orc
from tg_reporting_etl_spark.adapters import testdata as td
from tg_reporting_etl_spark.operators.leaderboard import (
    BONUS_CEIL,
    BONUS_FLOOR,
    LUCKY_N,
    TOP_N,
    leaderboard_config,
    vnd_ou_leaderboard,
)
from tg_reporting_etl_spark.plans.catalog import register

STATE_DATE = "1996-06-15"

_KEY = "platform || '|' || site_code || '|' || game_code || '|' || room_type || '|' || country || '|' || player_name || '|' || '" + STATE_DATE + "'"


def _h32(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def _u(salt: str) -> str:
    inner = f"key || '|{salt}'"
    return f"(({_h32(inner)}) + 0.5) / 4294967296.0"


def _gauss(salt: str, mu: float, sigma: float) -> str:
    u1, u2 = _u(salt + ":a"), _u(salt + ":b")
    return f"({mu} + {sigma} * sqrt(-2.0 * ln({u1})) * cos(2.0 * 3.141592653589793 * {u2}))"


def _oracle() -> str:
    win_terms = []
    for j in (1, 2, 3):
        n_j = f"abs(CAST(trunc({_gauss(f'n{j}', 115.0, 20.0)}) AS BIGINT))"
        r_j = f"(1 + CAST(floor({_u(f'r{j}')} * {n_j}) AS BIGINT))"
        win_terms.append(f"CASE WHEN {r_j} > 50 THEN stake * 0.98 * 1000.0 ELSE 0.0 END")
    win_round = " + ".join(win_terms)

    combos = """
config AS (
  SELECT p.platform, p.site_code, '05' AS game_code, r.room_type, c.country
  FROM (VALUES ('UFA','TG'), ('UFA','UAT'), ('UFA','TEST'), ('GEA','UAT')) p(platform, site_code)
  CROSS JOIN (VALUES ('1001'), ('1002')) r(room_type)
  CROSS JOIN (VALUES ('INR'), ('THB'), ('PHP'), ('VND2')) c(country)
)"""
    extra = [
        combos.strip(),
        f"""cand AS (
  SELECT cf.*, p.player_name,
         {_KEY} AS key
  FROM config cf
  JOIN (SELECT platform, site_code, player_name FROM player
        WHERE type = 'ROBOT' AND status = 'ACTIVATE') p
    USING (platform, site_code)
  WHERE NOT EXISTS (
    SELECT 1 FROM player_daily_ranking h
    WHERE h.state_date >= DATE '{STATE_DATE}' - 4 AND h.state_date <= DATE '{STATE_DATE}' - 1
      AND h.platform = cf.platform AND h.site_code = cf.site_code
      AND h.game_code = cf.game_code AND h.room_type = cf.room_type
      AND h.country = cf.country AND h.player_name = p.player_name)
)""",
        f"""roster AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY platform, site_code, game_code, room_type, country
      ORDER BY md5(key || ':roster')) AS _pick
    FROM cand) WHERE _pick <= {TOP_N}
)""",
        f"""mv AS (
  SELECT platform, site_code, game_code, room_type, country, MAX(win) AS _mv
  FROM player_daily_ranking
  WHERE state_date = DATE '{STATE_DATE}' AND NOT is_robot
  GROUP BY 1, 2, 3, 4, 5
)""",
        f"""sim AS (
  SELECT r.*, CASE WHEN COALESCE(m._mv, 0.0) <= 0 THEN 0.0 ELSE m._mv END AS max_value,
         row_number() OVER (
           PARTITION BY r.platform, r.site_code, r.game_code, r.room_type, r.country
           ORDER BY md5(r.key || ':lucky')) AS _lucky,
         abs(CAST(trunc({_gauss('g', 100.0, 500.0)}) AS BIGINT)) * 100 AS stake,
         (abs(CAST(trunc({_gauss('boost', 100.0, 500.0)}) AS BIGINT)) + 1) * 100 AS boost_stake
  FROM roster r
  LEFT JOIN mv m USING (platform, site_code, game_code, room_type, country)
)""",
        f"""played AS (
  SELECT *,
         CASE WHEN _lucky <= {LUCKY_N} THEN {win_round} ELSE 0.0 END AS _win_n,
         CASE WHEN _lucky <= {LUCKY_N} THEN (CAST(stake AS DOUBLE) * 3) * 1000.0 ELSE 0.0 END AS _bet_n
  FROM sim
)""",
        """boosted AS (
  SELECT *,
         CASE WHEN _win_n <= max_value
              THEN max_value + boost_stake * 0.98 * 5 * 1000.0 ELSE _win_n END AS win,
         _bet_n + CASE WHEN _win_n <= max_value
                       THEN CAST(boost_stake AS DOUBLE) * 5 * 1000.0 ELSE 0.0 END AS bet
  FROM played
)""",
        f"""final AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY platform, site_code, game_code, room_type, country
           ORDER BY win DESC, player_name ASC) AS rank_no,
         {BONUS_FLOOR} + ({_h32(f"platform || '|' || site_code || '|' || game_code || '|' || room_type || '|' || country || '|' || '{STATE_DATE}' || '|' || 'bn'")}
           % {BONUS_CEIL - BONUS_FLOOR + 1}) AS _n_bonus,
         row_number() OVER (
           PARTITION BY platform, site_code, game_code, room_type, country
           ORDER BY md5(key || ':bonus')) AS _bonus_pick
  FROM boosted
)""",
    ]
    body = f"""SELECT CAST('{STATE_DATE}' AS TIMESTAMP) AS state_date,
       platform, site_code, game_code, room_type, country, player_name,
       ROUND(bet, 6) AS bet, ROUND(win, 6) AS win,
       CAST(rank_no AS INT) AS rank_no,
       _bonus_pick <= _n_bonus AS is_bonus,
       TRUE AS is_robot
FROM final"""
    return orc.with_ctes(body, "player", "player_daily_ranking", extra=extra)


@register("player_ranking_1d_leaderboard", _oracle(), survey_ids="W1 W2 O3 O4 P8 G2 F9 T1")
def q_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = vnd_ou_leaderboard(
        td.player(spark, sf_dir),
        td.player_daily_ranking(spark, sf_dir),
        leaderboard_config(spark),
        STATE_DATE,
    )
    return out
