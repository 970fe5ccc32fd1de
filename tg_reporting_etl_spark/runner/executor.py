"""End-to-end executor: the reference's task-executor loop as a library.

Reference shape (task-executor/*, SURVEY §3.2): scan the board, filter
rows for your assignee (P7 dispatch), per task row run the report for
its window and write with delete-before-insert, then mark done with
runtime_second.  Here:

- the board is a DataFrame; the task loop is driver-side (it is
  orchestration metadata — hundreds of rows, never data);
- each family computes ALL its pending windows in ONE Spark job
  (set-oriented: the board rows define a window range, not N serial
  queries);
- tier tables are materialized parquet partitioned by their delete keys,
  written with dynamic partition overwrite (idempotent reruns);
- coarser tiers read the materialized finer tier — the cascade never
  rescans raw;
- cross-family dependencies (new_register / risk_ctrl reading the
  player & trans tiers — reference new_register_summary_1d.py:79,
  risk_ctrl_player_1d.py:60-130) are materialized-table reads with
  date-key partition pruning, exactly the reference's table layout.

Every report family the reference executes off the board is covered:
trans_summary (4 tiers), player_summary (4 tiers),
new_register_summary (1d), risk_ctrl player/game (1d), the stateful
risk_ctrl_rtp alert snapshot (1d), and the leaderboard (1d state runs).
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tg_reporting_etl_spark.operators import new_register as nr
from tg_reporting_etl_spark.operators import player_summary as ps
from tg_reporting_etl_spark.operators import risk_ctrl as rc
from tg_reporting_etl_spark.operators import trans_summary as ts
from tg_reporting_etl_spark.operators.leaderboard import leaderboard_config, vnd_ou_leaderboard
from tg_reporting_etl_spark.sources.writers import overwrite_window_partitions

# Partition layout per tier == the reference's DELETE keys
# (trans_summary_5min.py deletes at (summary_date, hours, mins);
# _1h at (summary_date, hours); _1d at summary_date; _1m at
# summary_month).  Dynamic partition overwrite then replaces exactly
# the windows the batch recomputed — an intra-day incremental run can
# never wipe earlier same-day windows it didn't touch.
TIER_PARTITIONS = {
    "5min": ["summary_date", "hours", "mins"],
    "1h": ["summary_date", "hours"],
    "1d": ["summary_date"],
    "1m": ["summary_month"],
}

_TIER_OF = {"5min": "5min", "1H": "1h", "1D": "1d", "1M": "1m"}
_FINER = {"1h": "5min", "1d": "1h", "1m": "1d"}


def _bound_date_keys(gte_s: str, lt_s: str) -> tuple[int, int]:
    """Inclusive int-date-key bounds for a half-open [gte, lt) range.

    ``lt`` is exclusive, so the last covered instant is ``lt - 1s``;
    using ``int(lt[:10])`` as an exclusive bound breaks on intra-day
    runs (lt = 15:00 on day D would yield an empty filter).  The
    rollup is idempotent per window, so over-inclusion within the
    boundary days is safe.
    """
    lo = int(gte_s[:10].replace("-", ""))
    last = datetime.fromisoformat(lt_s) - timedelta(seconds=1)
    hi = int(last.strftime("%Y%m%d"))
    return lo, hi


def _day_keys(gte_s: str, lt_s: str) -> list[int]:
    """Every int date key covered by [gte, lt)."""
    d = datetime.fromisoformat(gte_s[:10])
    last = datetime.fromisoformat(lt_s) - timedelta(seconds=1)
    out = []
    while d <= last:
        out.append(int(d.strftime("%Y%m%d")))
        d += timedelta(days=1)
    return out


class ReportFamily:
    """One report family: tier tables under ``out_dir`` + compute rules.

    Subclasses define ``report_class``, the supported ``tiers`` and
    :meth:`compute_tier`; the run/write/read plumbing is shared.
    """

    report_class: str = ""
    tiers: tuple[str, ...] = ()
    #: report_classes whose materialized tiers this family reads — the
    #: executor runs those first within the same board level (the
    #: reference encodes the same ordering in its level column plus
    #: dependency_check; SURVEY §2.10 ST4).
    depends_on: tuple[str, ...] = ()

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def table_path(self, tier: str) -> str:
        return os.path.join(self.out_dir, f"{self.report_class}_{tier}")

    def read_tier(self, spark: SparkSession, tier: str) -> DataFrame:
        return spark.read.parquet(self.table_path(tier))

    def compute_tier(
        self, spark: SparkSession, tier: str, gte_s: str, lt_s: str, platform: str, site_code: str
    ) -> DataFrame:
        raise NotImplementedError

    def run_tier(
        self, spark: SparkSession, tier: str, gte, lt, platform: str = "ALL", site_code: str = "ALL"
    ) -> int:
        """Compute one tier over [gte, lt) and overwrite its windows.
        Returns rows written."""
        out = self.compute_tier(spark, tier, str(gte), str(lt), platform, site_code).cache()
        n = out.count()
        if n:
            overwrite_window_partitions(out, self.table_path(tier), TIER_PARTITIONS[tier])
        out.unpersist()
        return n


class TieredRollupFamily(ReportFamily):
    """Shared 5min->1h->1d->1m materialized cascade (trans/player)."""

    tiers = ("5min", "1h", "1d", "1m")
    rollups: dict = {}

    def compute_base(self, gte_s: str, lt_s: str, platform: str, site_code: str) -> DataFrame:
        raise NotImplementedError

    def compute_tier(self, spark, tier, gte_s, lt_s, platform, site_code):
        if tier == "5min":
            return self.compute_base(gte_s, lt_s, platform, site_code)
        src = self.read_tier(spark, _FINER[tier])
        date_lo, date_hi = _bound_date_keys(gte_s, lt_s)
        # partition pruning on the finer tier's date key (inclusive
        # both ends — see _bound_date_keys)
        src = src.filter((F.col("summary_date") >= date_lo) & (F.col("summary_date") <= date_hi))
        return self.rollups[tier](src)


class TransSummaryFamily(TieredRollupFamily):
    """trans_summary executor family over a wallet-log DataFrame."""

    report_class = "trans_summary"
    rollups = {"1h": ts.trans_summary_1h, "1d": ts.trans_summary_1d, "1m": ts.trans_summary_1m}

    def __init__(self, wallet_log: DataFrame, out_dir: str):
        super().__init__(out_dir)
        self.wallet_log = wallet_log

    def compute_base(self, gte_s, lt_s, platform, site_code):
        return ts.trans_summary_5min(self.wallet_log, gte_s, lt_s, platform, site_code)


class PlayerSummaryFamily(TieredRollupFamily):
    """player_summary executor family over the bet-round log + site dim."""

    report_class = "player_summary"
    rollups = {"1h": ps.player_summary_1h, "1d": ps.player_summary_1d, "1m": ps.player_summary_1m}

    def __init__(self, profit_log: DataFrame, game_sites: DataFrame, out_dir: str):
        super().__init__(out_dir)
        self.profit_log = profit_log
        self.game_sites = game_sites

    def compute_base(self, gte_s, lt_s, platform, site_code):
        return ps.player_summary_5min(self.profit_log, self.game_sites, gte_s, lt_s, platform, site_code)


class NewRegisterFamily(ReportFamily):
    """new_register_summary_1d off the materialized player 5min tier
    (reference source table, new_register_summary_1d.py:79)."""

    report_class = "new_register_summary"
    tiers = ("1d",)
    depends_on = ("player_summary",)

    def __init__(self, player_family: PlayerSummaryFamily, player_dim: DataFrame, out_dir: str):
        super().__init__(out_dir)
        self.player_family = player_family
        self.player_dim = player_dim

    def compute_tier(self, spark, tier, gte_s, lt_s, platform, site_code):
        date_lo, date_hi = _bound_date_keys(gte_s, lt_s)
        p5 = self.player_family.read_tier(spark, "5min").filter(
            (F.col("summary_date") >= date_lo) & (F.col("summary_date") <= date_hi)
        )
        return nr.new_register_summary_1d(p5, self.player_dim)


class _RiskCtrlFamily(ReportFamily):
    """Risk report over materialized player (and trans) tiers.

    The catalog operator is single-day (date_key + 8-day lookback); the
    family computes a whole task range in ONE windowed plan
    (``risk_ctrl_*_days`` — per-day-equivalent by test), so a month
    backfill pays a constant number of shuffles instead of one
    re-aggregation per day.  ``_day_frame`` remains the per-day spec.
    """

    tiers = ("1d",)
    lookback_days = 8

    def _day_frame(self, spark: SparkSession, date_key: int) -> DataFrame:
        raise NotImplementedError

    def _days_frame(self, spark: SparkSession, date_keys: list[int]) -> DataFrame:
        raise NotImplementedError

    def _lookback_key(self, date_key: int) -> int:
        d = datetime.strptime(str(date_key), "%Y%m%d") - timedelta(days=self.lookback_days)
        return int(d.strftime("%Y%m%d"))

    def compute_tier(self, spark, tier, gte_s, lt_s, platform, site_code):
        return self._days_frame(spark, _day_keys(gte_s, lt_s))


class RiskCtrlPlayerFamily(_RiskCtrlFamily):
    report_class = "risk_ctrl_player"
    depends_on = ("player_summary", "trans_summary")

    def __init__(self, player_family: PlayerSummaryFamily, trans_family: TransSummaryFamily, out_dir: str):
        super().__init__(out_dir)
        self.player_family = player_family
        self.trans_family = trans_family

    def _day_frame(self, spark, date_key):
        return rc.risk_ctrl_player_1d(
            self.player_family.read_tier(spark, "1h"),
            self.player_family.read_tier(spark, "1d"),
            self.trans_family.read_tier(spark, "1h"),
            self.trans_family.read_tier(spark, "1d"),
            date_key,
            self._lookback_key(date_key),
        )

    def _days_frame(self, spark, date_keys):
        return rc.risk_ctrl_player_days(
            self.player_family.read_tier(spark, "1h"),
            self.player_family.read_tier(spark, "1d"),
            self.trans_family.read_tier(spark, "1h"),
            self.trans_family.read_tier(spark, "1d"),
            date_keys,
            self.lookback_days,
        )


class RiskCtrlGameFamily(_RiskCtrlFamily):
    report_class = "risk_ctrl_game"
    depends_on = ("player_summary",)

    def __init__(self, player_family: PlayerSummaryFamily, out_dir: str):
        super().__init__(out_dir)
        self.player_family = player_family

    def _day_frame(self, spark, date_key):
        return rc.risk_ctrl_game_1d(
            self.player_family.read_tier(spark, "1h"),
            self.player_family.read_tier(spark, "1d"),
            date_key,
            self._lookback_key(date_key),
        )

    def _days_frame(self, spark, date_keys):
        return rc.risk_ctrl_game_days(
            self.player_family.read_tier(spark, "1h"),
            self.player_family.read_tier(spark, "1d"),
            date_keys,
            self.lookback_days,
        )


class RiskCtrlRtpFamily(ReportFamily):
    """Stateful rtp alert snapshot dispatched off the board.

    The reference scans ONE ``risk_ctrl`` task list and rtp picks its
    assignee rows from it alongside player/game
    (task-executor/risk_ctrl/ScasRiskCtrlTask.py ->
    risk_ctrl_rtp_1d.py:12-33); each task row triggers a
    load-snapshot -> merge-batch -> persist run (runner/state.py), so
    alert_count / last_alert_time carry across board runs exactly like
    the reference's read-back DB state (risk_ctrl_rtp_1d.py:122-135).
    ``clock`` injects a frozen now() for deterministic throttle tests;
    production leaves it None (wall clock, like the reference's
    ``datetime.now()`` alert stamps).
    """

    report_class = "risk_ctrl_rtp"
    tiers = ("1d",)
    depends_on = ("player_summary",)

    def __init__(self, player_family: PlayerSummaryFamily, out_dir: str, clock=None):
        super().__init__(out_dir)
        self.player_family = player_family
        self.clock = clock

    def table_path(self, tier: str) -> str:
        return os.path.join(self.out_dir, "risk_ctrl_rtp_1d")

    def run_tier(self, spark, tier, gte, lt, platform: str = "ALL", site_code: str = "ALL") -> int:
        from tg_reporting_etl_spark.runner.state import run_rtp_days

        now = self.clock() if self.clock else datetime.now()
        p1h = self.player_family.read_tier(spark, "1h")
        # day snapshots are independent, so the whole contiguous range
        # merges as ONE aggregate + merge + partitioned write — a month
        # backfill issues O(1) Spark jobs, not ~30 sequential merges
        dks = _day_keys(str(gte), str(lt))
        return run_rtp_days(spark, p1h, dks, now, self.table_path(tier)).count()


class LeaderboardFamily(ReportFamily):
    """Daily leaderboard state runs (player_ranking_1d).

    Deliberately PER-DAY (one seeded simulation frame per date, unioned):
    every draw is keyed by the day string, and the candidate set is
    config-bounded (robots x configured sites), so a multi-day union is
    a constant-size plan per day over constant-size data — unlike the
    risk/rtp families, there is no data-proportional re-aggregation to
    vectorize."""

    report_class = "player_ranking"
    tiers = ("1d",)

    def __init__(self, player: DataFrame, player_daily_ranking: DataFrame, out_dir: str):
        super().__init__(out_dir)
        self.player = player
        self.player_daily_ranking = player_daily_ranking

    def table_path(self, tier: str) -> str:
        return os.path.join(self.out_dir, "player_ranking_1d")

    def compute_tier(self, spark, tier, gte_s, lt_s, platform, site_code):
        frames = [
            vnd_ou_leaderboard(
                self.player,
                self.player_daily_ranking,
                leaderboard_config(spark),
                f"{str(dk)[:4]}-{str(dk)[4:6]}-{str(dk)[6:]}",
            ).withColumn("summary_date", F.lit(dk).cast("int"))
            for dk in _day_keys(gte_s, lt_s)
        ]
        return reduce(DataFrame.unionByName, frames)


def execute_board(
    spark: SparkSession,
    board: DataFrame,
    families: ReportFamily | list[ReportFamily],
    now: str,
) -> list[dict]:
    """Run every pending task of the given families in priority order.

    Consecutive same-(family, tier, platform, site) tasks collapse into
    one window-range job (the set-oriented rewrite of the reference's
    per-row iterrows loop).  Families run in board level order, so
    cross-family tier dependencies (player 5min before new_register /
    risk_ctrl) resolve exactly as the reference's level column dictates.
    Returns completion records with runtime_second, the board-side
    bookkeeping of ExecUtils.py:57-84; open windows (lt_time > now)
    recompute but stay pending (ST2).
    """
    if isinstance(families, ReportFamily):
        families = [families]
    by_class = {f.report_class: f for f in families}

    pending = (
        board.filter((F.col("done") == 0) & F.col("report_class").isin(list(by_class)))
        .orderBy("level", "gte_time")
        .collect()
    )
    # group contiguous tasks per (family, freq, platform, site) into one range
    groups: dict[tuple, list] = {}
    for row in pending:
        groups.setdefault(
            (row.report_class, row.freq_type, row.platform, row.site_code), []
        ).append(row)

    def _depth(rclass: str) -> int:
        fam = by_class.get(rclass)
        if fam is None or not fam.depends_on:
            return 0
        return 1 + max(_depth(d) for d in fam.depends_on)

    records = []
    for (rclass, freq, platform, site), rows in sorted(
        groups.items(), key=lambda kv: (min(r.level for r in kv[1]), _depth(kv[0][0]), kv[0][0])
    ):
        family = by_class[rclass]
        tier = _TIER_OF[freq]
        if tier not in family.tiers:
            continue
        gte = min(r.gte_time for r in rows)
        lt = max(r.lt_time for r in rows)
        t0 = time.perf_counter()
        n = family.run_tier(spark, tier, gte, lt, platform, site)
        runtime = time.perf_counter() - t0
        for r in rows:
            records.append(
                {
                    "report_class": rclass,
                    "freq_type": freq,
                    "gte_time": r.gte_time,
                    "lt_time": r.lt_time,
                    "platform": platform,
                    "site_code": site,
                    "done": 1 if str(r.lt_time) <= now else 0,
                    "runtime_second": runtime,
                    "rows_written": n,
                }
            )
    return records
