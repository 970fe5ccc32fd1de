"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of ``tg_reporting_etl_spark.plans.catalog``: the driver
runs ``entry(spark)`` as a smoke check, then each ``queries()[name]`` at
sf=0.01 against ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives beside this file; make the import robust to
# whatever cwd/sys.path the driver uses
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from tg_reporting_etl_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the trans_summary 5-min
    tier (conditional-sum aggregation over tumbling windows — the spine
    of the reference's report family)."""
    return catalog.queries()["trans_summary_5min"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
