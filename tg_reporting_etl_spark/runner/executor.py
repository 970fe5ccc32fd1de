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
  rescans raw.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tg_reporting_etl_spark.operators import trans_summary as ts
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


class TransSummaryFamily:
    """trans_summary executor family over a wallet-log DataFrame."""

    report_class = "trans_summary"

    def __init__(self, wallet_log: DataFrame, out_dir: str):
        self.wallet_log = wallet_log
        self.out_dir = out_dir

    def table_path(self, tier: str) -> str:
        return os.path.join(self.out_dir, f"trans_summary_{tier}")

    def read_tier(self, spark: SparkSession, tier: str) -> DataFrame:
        return spark.read.parquet(self.table_path(tier))

    def run_tier(self, spark: SparkSession, tier: str, gte, lt, platform: str = "ALL", site_code: str = "ALL") -> int:
        """Compute one tier over [gte, lt) and overwrite its windows.
        Returns rows written."""
        gte_s, lt_s = str(gte), str(lt)
        if tier == "5min":
            out = ts.trans_summary_5min(self.wallet_log, gte_s, lt_s, platform, site_code)
        else:
            finer = {"1h": "5min", "1d": "1h", "1m": "1d"}[tier]
            src = self.read_tier(spark, finer)
            date_lo, date_hi = _bound_date_keys(gte_s, lt_s)
            # partition pruning on the finer tier's date key (inclusive
            # both ends — see _bound_date_keys)
            src = src.filter(
                (F.col("summary_date") >= date_lo) & (F.col("summary_date") <= date_hi)
            )
            out = {
                "1h": ts.trans_summary_1h,
                "1d": ts.trans_summary_1d,
                "1m": ts.trans_summary_1m,
            }[tier](src)
        out = out.cache()
        n = out.count()
        if n:
            overwrite_window_partitions(out, self.table_path(tier), TIER_PARTITIONS[tier])
        out.unpersist()
        return n


def execute_board(
    spark: SparkSession,
    board: DataFrame,
    family: TransSummaryFamily,
    now: str,
) -> list[dict]:
    """Run every pending task of the family in priority order.

    Consecutive same-(tier, platform, site) tasks collapse into one
    window-range job (the set-oriented rewrite of the reference's
    per-row iterrows loop).  Returns completion records with
    runtime_second, the board-side bookkeeping of ExecUtils.py:57-84;
    open windows (lt_time > now) recompute but stay pending (ST2).
    """
    pending = (
        board.filter((F.col("done") == 0) & (F.col("report_class") == family.report_class))
        .orderBy("level", "gte_time")
        .collect()
    )
    # group contiguous tasks per (freq, platform, site) into one range
    groups: dict[tuple, list] = {}
    for row in pending:
        groups.setdefault((row.freq_type, row.platform, row.site_code), []).append(row)

    records = []
    tier_of = {"5min": "5min", "1H": "1h", "1D": "1d", "1M": "1m"}
    for (freq, platform, site), rows in sorted(groups.items(), key=lambda kv: min(r.level for r in kv[1])):
        gte = min(r.gte_time for r in rows)
        lt = max(r.lt_time for r in rows)
        t0 = time.perf_counter()
        n = family.run_tier(spark, tier_of[freq], gte, lt, platform, site)
        runtime = time.perf_counter() - t0
        for r in rows:
            records.append(
                {
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
