"""Phase-profile the streaming update rows: time each wave's
processAllAvailable and each merge_into call to see where the wall goes.

Usage: python tools/profile_update_row.py [trans|player]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tg_reporting_etl_spark.sources.writers as wr

_orig_merge = wr.merge_into
_merge_times: list[float] = []


def _timed_merge(*a, **kw):
    t0 = time.perf_counter()
    out = _orig_merge(*a, **kw)
    _merge_times.append(time.perf_counter() - t0)
    return out


wr.merge_into = _timed_merge

from pyspark.sql.streaming import StreamingQuery

_orig_paa = StreamingQuery.processAllAvailable
_paa_times: list[float] = []


def _timed_paa(self):
    t0 = time.perf_counter()
    _orig_paa(self)
    _paa_times.append(time.perf_counter() - t0)


StreamingQuery.processAllAvailable = _timed_paa


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "trans"
    import __spark_entry__ as entry_mod
    from tg_reporting_etl_spark.session import get_spark

    spark = get_spark("profile_update")
    qs = entry_mod.queries()
    name = f"streaming_{which}_summary_update"
    # warm-up: JVM + parquet footers
    next(iter(qs.values()))(spark, "/root/testdata/sf0.1").count()
    t0 = time.perf_counter()
    df = qs[name](spark, "/root/testdata/sf0.1")
    n = df.count()
    total = time.perf_counter() - t0
    print(f"{name}: total {total:.2f}s rows={n}")
    print("processAllAvailable:", [round(t, 2) for t in _paa_times], f"sum {sum(_paa_times):.2f}")
    print("merge_into:", [round(t, 2) for t in _merge_times], f"sum {sum(_merge_times):.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
