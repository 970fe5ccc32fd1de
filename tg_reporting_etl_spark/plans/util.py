"""Helpers for the driver-facing query catalog."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Session-scoped persisted-DataFrame cache.  Keyed by the Spark
# applicationId (unique per SparkContext — unlike ``id(session)``,
# which CPython can reuse for a new session after the old one is
# garbage-collected, silently serving frames persisted in a dead
# context) plus a caller-chosen key that must include every input the
# built frame depends on (e.g. the sf_dir).
_DF_CACHE: dict[tuple[str, str], DataFrame] = {}

# Wall-clock seconds spent materializing each shared frame, keyed like
# _DF_CACHE.  Shared-cache builds are real work that min-of-N per-query
# timing would otherwise hide in a discarded first repeat; bench.py
# reports them as ``shared_cache_build_s`` so suite totals reconcile.
_BUILD_TIMES: dict[tuple[str, str], float] = {}


def cached_df(spark: SparkSession, key: str, build: Callable[[], DataFrame]) -> DataFrame:
    """Build-once-persist DataFrame shared across catalog queries.

    The shared rollup tiers and the dedup shingle table are each used
    by several queries; persisting them once turns N recomputes of the
    same shuffle into one.  The first call materializes the frame
    eagerly (``count()``) and records the wall time in ``_BUILD_TIMES``
    so benchmarks can attribute the build cost explicitly instead of
    folding it into whichever query happens to touch the cache first.
    """
    import time

    app_id = spark.sparkContext.applicationId
    ck = (app_id, key)
    if ck not in _DF_CACHE:
        # a new application means every frame cached under an old one is
        # dead weight (and unpersist() on them would fail anyway) — evict
        for stale in [k for k in _DF_CACHE if k[0] != app_id]:
            del _DF_CACHE[stale]
            _BUILD_TIMES.pop(stale, None)
        t0 = time.perf_counter()
        df = build().persist()
        df.count()
        _BUILD_TIMES[ck] = round(time.perf_counter() - t0, 3)
        _DF_CACHE[ck] = df
    return _DF_CACHE[ck]


def cache_build_times(spark: SparkSession) -> dict[str, float]:
    """Per-key materialization seconds for this session's shared caches."""
    app_id = spark.sparkContext.applicationId
    return {k[1]: v for k, v in _BUILD_TIMES.items() if k[0] == app_id}


def clear_df_cache() -> None:
    """Explicit invalidation hook (tests / long-lived drivers).

    Also releases the operators' tracked intra-query persists
    (functions.persist) — one valve covers every cached block the
    engine creates.
    """
    from tg_reporting_etl_spark.functions.persist import release_persists

    for df in _DF_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _DF_CACHE.clear()
    _BUILD_TIMES.clear()
    release_persists()


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
