from tg_reporting_etl_spark.functions.core import (
    safe_div,
    int_date_key,
    int_month_key,
    window_time_keys,
    wildcard_filter,
    clamped_sum,
    cond_sum,
    cond_count,
)

__all__ = [
    "safe_div",
    "int_date_key",
    "int_month_key",
    "window_time_keys",
    "wildcard_filter",
    "clamped_sum",
    "cond_sum",
    "cond_count",
]
