"""new_register_summary_1d — day-grain activity of newly-registered players.

Reference: task-executor/new_rigester_summary/new_register_summary_1d.py.
Per day D: players with reg_time in [D, D+1) and type='NORMAL' (:66-73)
inner-joined (payload-free -> semi-join semantics, SURVEY §2.3 J3) to the
day's player_summary rows, then grouped to (platform, site_code,
game_code, country) with summed measures + reg_count = joined row count
(:113-126).

Set-oriented: the reference runs one day per task; here every day in the
range is computed in one job by joining on (player_name, registration
day) — the registration day is just another equi-join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions.core import int_date_key

GROUP_KEYS = ["platform", "site_code", "game_code", "country"]
MEASURES = ["b_count", "b_amount", "w_amount", "fee_amount", "profit_amount", "refund_amount"]


def new_register_summary_1d(player_summary_5min: DataFrame, player: DataFrame) -> DataFrame:
    """All-days new-register summary.

    ``player_summary_5min`` is the engine's 5-min tier (the reference's
    source table, :79); ``player`` the dimension.  The join is INNER on
    player_name with right-side payload dropped (:113-118) — with a
    deduped player dim this is exactly a semi-join, but the reference's
    registration-day restriction makes (player_name, reg day) the true
    key, so an equi-join on both is used and only left columns survive.
    """
    day_agg = player_summary_5min.groupBy(
        "summary_date", "platform", "site_code", "game_code", "player_name", "country"
    ).agg(
        F.sum("b_count").cast("long").alias("b_count"),
        *[F.sum(m).alias(m) for m in MEASURES[1:]],
    )
    regs = player.filter(player.type == "NORMAL").select(
        player.player_name.alias("reg_player"),
        int_date_key(player.reg_time).alias("reg_date"),
    )
    joined = day_agg.join(
        F.broadcast(regs),
        (day_agg.player_name == regs.reg_player) & (day_agg.summary_date == regs.reg_date),
        "inner",
    ).drop("reg_player", "reg_date")
    return joined.groupBy(*GROUP_KEYS, "summary_date").agg(
        F.sum("b_count").cast("long").alias("b_count"),
        *[F.sum(m).alias(m) for m in MEASURES[1:]],
        F.count("player_name").cast("long").alias("reg_count"),
    )
