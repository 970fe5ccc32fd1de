"""Helpers for the driver-facing query catalog."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def round_doubles(df: DataFrame, places: int = 6) -> DataFrame:
    """Round every DoubleType column to ``places`` decimals.

    Spark and DuckDB sum floating-point columns in different orders; the
    raw sums differ in the last ulps.  Both sides of every oracle pair
    round their final projection to the same number of places so the
    driver's value-hash compares stable digits only.  The ``+ 0.0``
    collapses IEEE ``-0.0`` to ``+0.0`` (engines disagree on the sign of
    zero-valued sums/differences).
    """
    cols = [
        (F.round(F.col(f.name), places) + F.lit(0.0)).alias(f.name)
        if isinstance(f.dataType, T.DoubleType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)
