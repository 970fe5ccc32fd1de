"""Time a subset of catalog queries with bench.py's methodology.

Usage: python tools/qtime.py [-r N] [sf_dir] query [query ...]

Same timed action as bench.py (build + count, min-of-N with
release_persists between queries) so numbers are comparable to
BENCH_FULL.json rows, without paying the whole catalog.  For A/B
measurement of one optimization: run on the before tree and the after
tree back to back (same machine regime window).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    repeats = 3
    if args and args[0] == "-r":
        repeats = int(args[1])
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    import __spark_entry__ as entry_mod
    from tg_reporting_etl_spark.functions.persist import release_persists
    from tg_reporting_etl_spark.session import get_spark

    spark = get_spark("qtime")
    qs = entry_mod.queries()
    unknown = [a for a in args if a not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # same warm-up as bench.py: one query to pay JVM + parquet footers
    next(iter(qs.values()))(spark, sf_dir).count()

    timings: dict[str, dict] = {}
    for name in args:
        fn = qs[name]
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            times.append(time.perf_counter() - t0)
            assert n >= 0
        release_persists()
        times.sort()
        timings[name] = {
            "min": round(times[0], 3),
            "med": round(times[len(times) // 2], 3),
            "max": round(times[-1], 3),
        }
        print(f"{name:45s} min {times[0]:7.3f}  med {times[len(times)//2]:7.3f}  max {times[-1]:7.3f}", flush=True)

    from tg_reporting_etl_spark.plans.util import cache_build_times

    print(json.dumps({"queries": timings, "cache_builds": cache_build_times(spark), "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
