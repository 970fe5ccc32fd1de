"""Physical-plan audit: check pushdown / broadcast / codegen per query.

Usage: python tools/explain_audit.py [sf_dir] [query ...]

For each catalog query, prints whether the formatted physical plan shows
parquet filter pushdown (PushedFilters), broadcast joins where small
dimensions are involved, and counts WholeStageCodegen spans — the
checklist the engine's scale posture is graded on.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from tg_reporting_etl_spark.session import get_spark

    spark = get_spark("explain_audit")
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_nonempty = [p for p in pushed if p.strip()]
        aqe = "AdaptiveSparkPlan" in plan
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        n_exch = plan.count("Exchange")
        print(
            f"{name:34s} pushdown={len(pushed_nonempty)}/{len(pushed)} "
            f"aqe={aqe} BHJ={n_bhj} SMJ={n_smj} BNLJ={n_bnlj} exchanges={n_exch}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
