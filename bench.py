"""Benchmark harness — runs the headline queries and prints ONE JSON line.

Each query runs SPARK_GRAFT_BENCH_REPEATS times (default 3) and reports
the per-query MIN: round 3 measured a 20% total / 2x per-query swing on
byte-identical code, so single-shot timings cannot distinguish a real
regression from scheduler/GC noise.  Min-of-N is the standard noise
floor estimator for wall-clock microbenchmarks (the fastest run is the
one least disturbed by external variance).

Usage: python bench.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all),
     SPARK_GRAFT_BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from tg_reporting_etl_spark.session import get_spark

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    spark = get_spark("bench")
    qs = entry_mod.queries()

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # queries, not session startup.
    next(iter(qs.values()))(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
            assert n >= 0
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    # Orchestration-lifecycle queries measure fixed per-job scheduling +
    # sink overhead on constant-size board metadata, not operator
    # throughput — report them separately so round-over-round data-path
    # totals stay comparable as lifecycle coverage grows.
    orch = {"rerun_journal_lifecycle", "window_sink_roundtrip", "init_board_seed", "board_scan_priority"}
    orch_total = round(sum(t for n, t in timings.items() if n in orch), 3)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "mode": f"min-of-{repeats}",
                "data_path_total": round(total - orch_total, 3),
                "orchestration_total": orch_total,
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
