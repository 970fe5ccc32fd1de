from tg_reporting_etl_spark.sources.readers import load_table, load_tables, TESTDATA_TABLES
from tg_reporting_etl_spark.sources.writers import (
    write_append,
    overwrite_window_partitions,
)

__all__ = [
    "load_table",
    "load_tables",
    "TESTDATA_TABLES",
    "write_append",
    "overwrite_window_partitions",
]
