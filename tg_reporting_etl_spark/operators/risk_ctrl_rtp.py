"""risk_ctrl_rtp_1d — stateful RTP alerting with throttle/cap.

Reference: task-executor/risk_ctrl/risk_ctrl_rtp_1d.py.  Per run over day
D it recomputes current-day aggregates, flags risky players, merges into
the day's snapshot (carrying alert_count / last_alert_time across runs),
throttles alerts to one per ``time_to_alert`` minutes and caps them at
``alert_limit`` (:122-194; params report_config.py:59-66).

Engine design: the state transition is a **pure function**
``(old_state | None, new_batch, now) -> new_state`` so it can be driven
by the batch runner (snapshot parquet per day, SURVEY §2.10 ST5), unit
tested with a frozen clock, and later lifted into
``transformWithState``.  The merge is the reference's pandas
join-overwrite-union re-expressed as left join + anti join + unionByName
(SURVEY §2.3 J4/J5) — no UDFs, no collect.

Faithful quirks preserved:
- first run writes the batch with alert_count=0 / epoch last_alert_time
  and **skips** throttle/cap entirely (:129-135) — so alerts fire on the
  2nd run at the earliest;
- snapshot rows absent from the new batch get NULL measures (pandas
  overwrite-with-NaN, :144-150), not their old values;
- reset zeroes alert state for currently-not-risky rows (:153-155).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tg_reporting_etl_spark.config import RISK_CTRL_1D
from tg_reporting_etl_spark.functions.core import safe_div
from tg_reporting_etl_spark.functions.persist import tracked_persist

KEYS = ["platform", "site_code", "player_name", "game_code", "country"]
_EPOCH = "1970-01-01 00:00:00"
_OVERWRITE = ["b_count", "b_cur", "p_cur", "rtp_cur", "is_risky", "send_alert"]
FINAL_COLUMNS = [
    "summary_date",
    *KEYS,
    *_OVERWRITE,
    "alert_count",
    "last_alert_time",
    "update_time",
    "create_time",
]

#: Declared schema of the persisted state table.  Reads pass it
#: explicitly: an empty-but-touched day is a bare marker partition dir
#: with no parquet files, so schema inference would fail on a state dir
#: holding only markers — and at scale an explicit schema skips footer
#: sampling entirely.
FINAL_SCHEMA = T.StructType(
    [
        T.StructField("summary_date", T.IntegerType()),
        *[T.StructField(k, T.StringType()) for k in KEYS],
        T.StructField("b_count", T.LongType()),
        T.StructField("b_cur", T.DoubleType()),
        T.StructField("p_cur", T.DoubleType()),
        T.StructField("rtp_cur", T.DoubleType()),
        T.StructField("is_risky", T.IntegerType()),
        T.StructField("send_alert", T.IntegerType()),
        T.StructField("alert_count", T.LongType()),
        T.StructField("last_alert_time", T.TimestampType()),
        T.StructField("update_time", T.TimestampType()),
        T.StructField("create_time", T.TimestampType()),
    ]
)


def rtp_batch(player_1h: DataFrame, date_key: int) -> DataFrame:
    """Current-day meta + risky/send flags (risk_ctrl_rtp_1d.py:63-120).

    b_count counts *1h-tier rows* (COUNT(b_amount) over the hourly
    summary, :79) — a distinct-active-hours count, not a bet count.
    """
    cfg = RISK_CTRL_1D["rtp"]
    meta = (
        player_1h.filter(F.col("summary_date") == date_key)
        .groupBy(*KEYS)
        .agg(
            F.count("b_amount").alias("b_count"),
            F.sum("b_amount").alias("b_cur"),
            F.sum("profit_amount").alias("p_cur"),
        )
        .withColumn("rtp_cur", safe_div(F.col("p_cur"), F.col("b_cur")))
        .withColumn("summary_date", F.lit(date_key).cast("int"))
    )
    risky = (
        (F.col("p_cur") >= cfg["profit_threshold"])
        & (F.col("b_count") >= cfg["bet_count_threshold"])
        & (F.col("rtp_cur") >= cfg["rtp_threshold"])
    ) | (F.col("p_cur") >= cfg["profit_unconditional"])
    flag = F.when(risky, 1).otherwise(0)
    return meta.withColumn("is_risky", flag).withColumn("send_alert", flag)


def rtp_batch_days(player_1h: DataFrame, date_keys: list[int]) -> DataFrame:
    """Multi-day :func:`rtp_batch`: ONE aggregation pass over the whole
    contiguous backfill range instead of a per-day driver loop — same
    per-(summary_date, keys) rows, grouped by summary_date too."""
    cfg = RISK_CTRL_1D["rtp"]
    meta = (
        player_1h.filter(F.col("summary_date").isin([int(d) for d in date_keys]))
        .groupBy("summary_date", *KEYS)
        .agg(
            F.count("b_amount").alias("b_count"),
            F.sum("b_amount").alias("b_cur"),
            F.sum("profit_amount").alias("p_cur"),
        )
        .withColumn("rtp_cur", safe_div(F.col("p_cur"), F.col("b_cur")))
        .withColumn("summary_date", F.col("summary_date").cast("int"))
    )
    risky = (
        (F.col("p_cur") >= cfg["profit_threshold"])
        & (F.col("b_count") >= cfg["bet_count_threshold"])
        & (F.col("rtp_cur") >= cfg["rtp_threshold"])
    ) | (F.col("p_cur") >= cfg["profit_unconditional"])
    flag = F.when(risky, 1).otherwise(0)
    return meta.withColumn("is_risky", flag).withColumn("send_alert", flag)


def _rtp_init(new_batch: DataFrame, now_lit, epoch) -> DataFrame:
    """First-run init: alert state zeroed, throttle/cap SKIPPED (:129-135)."""
    return (
        new_batch.withColumn("alert_count", F.lit(0).cast("long"))
        .withColumn("last_alert_time", epoch)
        .withColumn("update_time", now_lit)
        .withColumn("create_time", now_lit)
        .select(*FINAL_COLUMNS)
    )


def rtp_merge_days(
    old_state: DataFrame | None,
    new_batch: DataFrame,
    now: dt.datetime,
    state_days: list[int] | None = None,
) -> DataFrame:
    """Multi-day state transition: day snapshots are independent (each
    day's state depends only on that day's batch and its own prior
    snapshot), so a contiguous backfill merges as ONE plan — days listed
    in ``state_days`` (snapshot exists, even if empty) run the full
    merge + throttle/cap; days absent from it run the first-run init
    branch, which skips throttle/cap (reference quirk, :129-135).
    ``state_days=None`` preserves :func:`rtp_merge` semantics: all batch
    days are treated as stateful when ``old_state`` exists.
    """
    now_lit = F.lit(now.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    epoch = F.lit(_EPOCH).cast("timestamp")

    if old_state is None:
        if state_days:
            # a day listed as stateful MUST come with its snapshot —
            # merging against nothing would re-init alert state for a
            # day the caller just asserted has history
            raise ValueError(
                "rtp_merge_days: state_days is non-empty but old_state is None — "
                "load the listed snapshots (run_rtp_days does) or pass state_days=[]"
            )
        return _rtp_init(new_batch, now_lit, epoch)

    if state_days is not None:
        days = [int(d) for d in state_days]
        batch_init = new_batch.filter(~F.col("summary_date").isin(days))
        batch_merge = new_batch.filter(F.col("summary_date").isin(days))
    else:
        batch_init, batch_merge = None, new_batch

    # old rows updated in place; measures overwritten from the new batch
    # (NULL where the key vanished — pandas NaN-overwrite semantics).
    # summary_date joins too: day snapshots never cross-contaminate.
    jk = ["summary_date", *KEYS]
    updated = (
        old_state.select("summary_date", *KEYS, "alert_count", "last_alert_time", "create_time")
        .join(batch_merge.select("summary_date", *KEYS, *_OVERWRITE), jk, "left")
        .withColumn("alert_count", F.when(F.col("is_risky") == 0, F.lit(0)).otherwise(F.col("alert_count")).cast("long"))
        .withColumn("send_alert", F.when(F.col("is_risky") == 0, 0).otherwise(F.col("send_alert")))
        .withColumn("last_alert_time", F.when(F.col("is_risky") == 0, epoch).otherwise(F.col("last_alert_time")))
    )
    fresh = (
        batch_merge.join(old_state.select("summary_date", *KEYS), jk, "left_anti")
        .withColumn("alert_count", F.lit(0).cast("long"))
        .withColumn("last_alert_time", epoch)
        .withColumn("create_time", now_lit)
    )
    merged = updated.select(*[c for c in FINAL_COLUMNS if c != "update_time"]).unionByName(
        fresh.select(*[c for c in FINAL_COLUMNS if c != "update_time"])
    ).withColumn("update_time", now_lit)

    cfg = RISK_CTRL_1D["rtp"]
    # throttle: alerted less than time_to_alert minutes ago -> mute (:172-183)
    minutes_since = (F.unix_timestamp(now_lit) - F.unix_timestamp("last_alert_time")) / 60.0
    throttled = F.when(minutes_since < cfg["time_to_alert_minutes"], 0).otherwise(F.col("send_alert"))
    # cap: at alert_limit -> mute; survivors increment + restamp (:186-194)
    final_send = F.when((throttled == 1) & (F.col("alert_count") >= cfg["alert_limit"]), 0).otherwise(throttled)
    stepped = (
        merged.withColumn("send_alert", final_send)
        .withColumn(
            "alert_count",
            (F.col("alert_count") + F.when(F.col("send_alert") == 1, 1).otherwise(0)).cast("long"),
        )
        .withColumn(
            "last_alert_time",
            F.when(F.col("send_alert") == 1, now_lit).otherwise(F.col("last_alert_time")),
        )
    )
    out = stepped.select(*FINAL_COLUMNS)
    if batch_init is not None:
        out = out.unionByName(_rtp_init(batch_init, now_lit, epoch))
    return out


def rtp_merge(old_state: DataFrame | None, new_batch: DataFrame, now: dt.datetime) -> DataFrame:
    """One single-day state transition (risk_ctrl_rtp_1d.py:122-194)
    with frozen clock — the ``state_days=None`` case of
    :func:`rtp_merge_days`."""
    return rtp_merge_days(old_state, new_batch, now, state_days=None)


def run_rtp_scenario(
    player_1h_batches: list[DataFrame], date_key: int, clocks: list[dt.datetime]
) -> DataFrame:
    """Drive N update-mode runs over one day (ST2: each run sees a grown
    source) and return the final snapshot.

    Each merge references its batch twice (left join + anti join) and
    the prior state twice, so an unpersisted N-run chain recomputes
    early states 2^k times; persisting each batch and intermediate
    state keeps EXECUTION linear.  The LOGICAL plan still doubles per
    run (persist does not truncate lineage — the analyzer walks the
    full tree), so every 8th state is additionally ``localCheckpoint``-ed
    lazily: lineage stays bounded at ~2^8 nodes regardless of chain
    length, while the whole scenario remains one deferred computation.
    Repeated source frames (the same DataFrame object passed for several
    runs — e.g. update-mode reruns over an unchanged source) aggregate
    once.
    """
    state: DataFrame | None = None
    batch_cache: dict[int, DataFrame] = {}
    n = len(player_1h_batches)
    for i, (batch_src, now) in enumerate(zip(player_1h_batches, clocks)):
        key = id(batch_src)
        if key not in batch_cache:
            batch_cache[key] = tracked_persist(rtp_batch(batch_src, date_key))
        state = rtp_merge(state, batch_cache[key], now)
        if (i + 1) % 8 == 0:
            state = state.localCheckpoint(eager=False)
        elif i < n - 1:  # the final state is consumed once — don't cache it
            state = tracked_persist(state)
    assert state is not None
    return state
