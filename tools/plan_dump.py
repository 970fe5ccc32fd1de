"""Dump `.explain("formatted")` for catalog queries to files.

Usage: python tools/plan_dump.py OUT_DIR SUFFIX [sf_dir] [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each selected catalog query
(default: all).  Streaming / lifecycle rows execute their simulation as
a side effect of building the returned frame; their dumped plan is the
LocalRelation of the collected result plus a header noting that — the
meaningful plans for those rows live in the pipeline functions and are
asserted by tests/test_plan_shapes.py instead.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from tg_reporting_etl_spark.session import get_spark

    spark = get_spark("plan_dump")
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — dump what we can
            plan = f"ERROR building plan: {exc!r}"
        dt = time.perf_counter() - t0
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- query: {name}  sf_dir: {sf_dir}  build+explain: {dt:.2f}s\n")
            fh.write(plan.rstrip() + "\n")
        print(f"{name:40s} {dt:6.2f}s -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
