"""player_ranking_1d VND-OU leaderboard — simulated robot top-20.

Reference: task-executor/player_ranking/player_ranking_1d_vnd_ou_leaderboard.py.
Per (platform, site_code, game_code, room_type, country) × day:
roster = ACTIVATE robots at the site minus names shown in the previous
3 days (:121-143), 20 picked at random; 5 "lucky" robots play 3
simulated bets each (gauss stakes, ~51% win, 2% rake, ×1000 scaling,
:161-185); then every robot whose win is not above the best *real*
player's daily win is boosted until the whole board sits strictly above
it (:199-216); final rank_no = row_number by win desc; 3-8 robots get
is_bonus (:301-350).

Spark-first redesign — deterministic and fully distributed:

- randomness: the reference uses process-local ``random`` (irreproducible
  by design); here every draw is an md5-hash uniform
  ``u = (int(md5(key||salt)[:8], 16) + 0.5) / 2^32`` derived from the row
  key, so results are identical across partitionings, retries and
  engines, and the DuckDB oracle can replay them exactly.  Gaussians via
  Box-Muller on two such uniforms.  Equivalence to the reference is
  *distributional + invariant* (SURVEY §7 "what's hard"), not
  value-for-value — impossible anyway across RNGs.
- ``sample(n)`` (O4): rank by an md5 draw inside the group, take the
  first n — one window function, no driver loop.
- displacement loop (O3): closed form.  The reference loop terminates
  exactly when min(robot win) > max_value; here any robot at or below
  max_value after its normal round jumps to ``max_value + boost`` with a
  gauss-shaped positive boost — same invariant, same boost arithmetic
  (stake×0.98×5×1000), zero iterations.
- all 10 site combos × all days compute in ONE job (the reference loops
  serially per combo, :397-409).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

LEADERBOARD_KEYS = ["platform", "site_code", "game_code", "room_type", "country"]

# Maintenance list — same shape as the reference's VND_OU_LEADERBOARD_LIST
# (player_ranking_1d_config.py:19-34): nested dict exploded to a site
# cross product (G2).
VND_OU_LEADERBOARD_LIST = [
    {
        "platform": "UFA",
        "site_code": ["TG", "UAT", "TEST"],
        "game_code": ["05"],
        "room_type": ["1001", "1002"],
        "country": ["INR", "THB", "PHP", "VND2"],
    },
    {
        "platform": "GEA",
        "site_code": ["UAT"],
        "game_code": ["05"],
        "room_type": ["1001", "1002"],
        "country": ["INR", "THB", "PHP", "VND2"],
    },
]

TOP_N = 20
LUCKY_N = 5
BONUS_FLOOR, BONUS_CEIL = 3, 8  # VND_OU_BONUS_RELEASE_* (config :14-17)


def leaderboard_config(spark: SparkSession) -> DataFrame:
    """Config cross product via explode (G2; reference json_normalize +
    .explode chain at leaderboard :33-37)."""
    df = spark.createDataFrame(
        [
            (c["platform"], c["site_code"], c["game_code"], c["room_type"], c["country"])
            for c in VND_OU_LEADERBOARD_LIST
        ],
        "platform string, site_code array<string>, game_code array<string>, "
        "room_type array<string>, country array<string>",
    )
    for col in ("site_code", "game_code", "room_type", "country"):
        df = df.withColumn(col, F.explode(col))
    return df


def _h32(*parts: Column | str) -> Column:
    """First 8 md5 hex chars as an unsigned 32-bit int (cross-engine)."""
    s = F.concat_ws("|", *[p if isinstance(p, Column) else F.lit(p) for p in parts])
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _u(key: Column, salt: str) -> Column:
    """Deterministic uniform in (0, 1)."""
    return (_h32(key, salt) + F.lit(0.5)) / F.lit(4294967296.0)


def _gauss(key: Column, salt: str, mu: float, sigma: float) -> Column:
    """Box-Muller gaussian from two hash uniforms (F9)."""
    u1, u2 = _u(key, salt + ":a"), _u(key, salt + ":b")
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * 3.141592653589793 * u2)
    return F.lit(mu) + F.lit(sigma) * z


def vnd_ou_leaderboard(
    player: DataFrame,
    player_daily_ranking: DataFrame,
    config: DataFrame,
    state_date: str,
) -> DataFrame:
    """One day's leaderboard for every configured site combo.

    ``player_daily_ranking`` doubles as the recent-appearance history
    (anti-join exclusion, :141 — the engine's stand-in for reading back
    player_ranking_1d) and as the real-player max_value source (:221-250).
    """
    d = F.lit(state_date).cast("date")

    robots = player.filter((player.type == "ROBOT") & (player.status == "ACTIVATE")).select(
        "platform", "site_code", "player_name"
    )
    cand = config.join(robots, ["platform", "site_code"], "inner")

    # P8: anti-membership — exclude names on the board in the last 3 days
    # (window [D-4, D-1], reference keeps the 4-day-wide '3 days', :99-100)
    recent = (
        player_daily_ranking.filter(
            (F.col("state_date") >= F.date_sub(d, 4)) & (F.col("state_date") <= F.date_sub(d, 1))
        )
        .select(*LEADERBOARD_KEYS, "player_name")
        .distinct()
    )
    cand = cand.join(recent, [*LEADERBOARD_KEYS, "player_name"], "left_anti")

    key = F.concat_ws("|", *LEADERBOARD_KEYS, F.col("player_name"), F.lit(state_date))
    combo = W.partitionBy(*LEADERBOARD_KEYS)

    # O4: deterministic sample(n=20) — md5-order row_number
    roster = (
        cand.withColumn("_pick", F.row_number().over(combo.orderBy(F.md5(F.concat(key, F.lit(":roster"))))))
        .filter(F.col("_pick") <= TOP_N)
        .drop("_pick")
    )

    # real players' best daily win; <= 0 -> default 0 (:236-248)
    mv = (
        player_daily_ranking.filter((F.col("state_date") == d) & (~F.col("is_robot")))
        .groupBy(*LEADERBOARD_KEYS)
        .agg(F.max("win").alias("_mv"))
    )
    roster = roster.join(mv, LEADERBOARD_KEYS, "left").withColumn(
        "max_value", F.when(F.coalesce(F.col("_mv"), F.lit(0.0)) <= 0, 0.0).otherwise(F.col("_mv"))
    ).drop("_mv")

    # O4 again: 5 lucky robots play a normal round of 3 bets
    lucky = F.row_number().over(combo.orderBy(F.md5(F.concat(key, F.lit(":lucky"))))) <= LUCKY_N
    stake = F.abs(_gauss(key, "g", 100.0, 500.0).cast("long")) * 100  # gauss stake ×100 (:172)

    win_round = F.lit(0.0)
    for j in (1, 2, 3):  # 3 bets, same stake, independent win draws (:170-184)
        n_j = F.abs(_gauss(key, f"n{j}", 115.0, 20.0).cast("long"))
        r_j = (F.lit(1) + F.floor(_u(key, f"r{j}") * n_j)).cast("long")
        win_round = win_round + F.when(r_j > 50, stake * 0.98 * 1000.0).otherwise(0.0)
    bet_round = stake.cast("double") * 3 * 1000.0

    sim = roster.withColumn("_win_n", F.when(lucky, win_round).otherwise(0.0)).withColumn(
        "_bet_n", F.when(lucky, bet_round).otherwise(0.0)
    )

    # O3 closed-form displacement: at-or-below max_value -> boosted above
    # it with the boost-round arithmetic (stake×5, 0.98 rake, ×1000; :175-178)
    boost_stake = (F.abs(_gauss(key, "boost", 100.0, 500.0).cast("long")) + 1) * 100
    needs_boost = F.col("_win_n") <= F.col("max_value")
    final = (
        sim.withColumn(
            "win",
            F.when(needs_boost, F.col("max_value") + boost_stake * 0.98 * 5 * 1000.0).otherwise(F.col("_win_n")),
        )
        .withColumn(
            "bet",
            F.col("_bet_n") + F.when(needs_boost, boost_stake.cast("double") * 5 * 1000.0).otherwise(0.0),
        )
        .drop("_win_n", "_bet_n", "max_value")
    )

    # W1: rank(method='first') == row_number; deterministic tie-break by name
    rank_no = F.row_number().over(combo.orderBy(F.desc("win"), F.asc("player_name")))
    # bonus: 3-8 winners by md5 order (:347-350)
    n_bonus = BONUS_FLOOR + (_h32(F.concat_ws("|", *LEADERBOARD_KEYS), state_date, "bn") % (BONUS_CEIL - BONUS_FLOOR + 1))
    bonus_pick = F.row_number().over(combo.orderBy(F.md5(F.concat(key, F.lit(":bonus")))))

    return final.select(
        # timestamp (not date): pandas renders DATE columns differently
        # per engine, which breaks dtype-sensitive result hashing
        d.cast("timestamp").alias("state_date"),
        *LEADERBOARD_KEYS,
        "player_name",
        F.round(F.col("bet"), 6).alias("bet"),
        F.round(F.col("win"), 6).alias("win"),
        rank_no.alias("rank_no"),
        (bonus_pick <= n_bonus).alias("is_bonus"),
        F.lit(True).alias("is_robot"),
    )
