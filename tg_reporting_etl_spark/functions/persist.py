"""Tracked intra-query persists.

Library operators (dedup candidate tables, rtp state chains) persist
intermediates that are referenced twice within one returned plan.  The
returned DataFrame is lazy, so the operator itself can never know when
it is safe to unpersist — instead every such persist is registered here
and released in bulk by :func:`release_persists`, which
``plans.util.clear_df_cache`` calls too.  A long-lived driver (the
reference's cron loop shape) therefore has ONE release valve covering
every cached block the engine creates, instead of leaking blocks until
the context dies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` registered for bulk release."""
    df = df.persist()
    _LIVE.append(df)
    return df


def release_persists() -> None:
    """Unpersist every tracked frame (safe to call on a dead context)."""
    for df in _LIVE:
        try:
            df.unpersist()
        except Exception:
            pass
    _LIVE.clear()
