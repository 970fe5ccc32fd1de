"""JDBC delete-before-insert sink: statement building, ALL-wildcard
semantics, delete->insert ordering, and the no-driver error path.

Reference: task-executor/trans_summary/trans_summary_5min.py:104-128
(delete_before_insert) — the engine's parquet sink maps the same
semantics onto dynamic partition overwrite; this is the literal JDBC
twin for DB-serving deployments."""

from __future__ import annotations

import pytest

from tg_reporting_etl_spark.sources.writers import (
    build_window_delete,
    jdbc_overwrite_window,
)


def test_build_window_delete_literals_and_wildcards():
    sql = build_window_delete(
        "trans_summary_5min",
        {"summary_date": 20240102, "hours": 7, "mins": 55, "platform": "P1", "site_code": "ALL"},
    )
    assert sql == (
        "DELETE FROM trans_summary_5min WHERE summary_date = 20240102"
        " AND hours = 7 AND mins = 55 AND platform = 'P1'"
    )


def test_build_window_delete_all_wildcards_deletes_whole_table():
    assert (
        build_window_delete("t", {"platform": "ALL", "site_code": "ALL"})
        == "DELETE FROM t WHERE 1=1"
    )


def test_build_window_delete_escapes_quotes_and_null():
    """Quotes double; a None key must match NULL rows (IS NULL), not
    emit the never-true `col = NULL`."""
    sql = build_window_delete("t", {"name": "o'brien", "game_code": None})
    assert sql == "DELETE FROM t WHERE name = 'o''brien' AND game_code IS NULL"


def test_jdbc_overwrite_window_orders_delete_before_insert(spark):
    df = spark.range(3)
    calls: list[tuple[str, object]] = []
    ran = jdbc_overwrite_window(
        spark,
        "jdbc:fake://db",
        "tier_1d",
        df,
        {"summary_date": 20240102, "platform": "ALL"},
        execute_update=lambda url, sql: calls.append(("delete", url, sql)),
        write_batch=lambda batch: calls.append(("insert", batch)),
    )
    assert [c[0] for c in calls] == ["delete", "insert"]
    assert calls[0][1] == "jdbc:fake://db"
    assert calls[0][2] == ran == "DELETE FROM tier_1d WHERE summary_date = 20240102"
    assert calls[1][1] is df


def test_jdbc_default_transport_raises_without_driver(spark):
    """No JDBC driver ships in the container: the DriverManager path
    must surface the JVM's no-suitable-driver error, not swallow it."""
    with pytest.raises(Exception) as exc:
        jdbc_overwrite_window(
            spark, "jdbc:nosuchdb://x", "t", spark.range(1), {"k": 1},
            write_batch=lambda b: None,
        )
    assert "driver" in str(exc.value).lower() or "SQLException" in str(exc.value)


def test_sql_literal_rejects_non_finite_floats():
    # bare inf/nan is invalid SQL on MySQL/most JDBC targets; NULL-izing
    # a DELETE predicate would silently match nothing — reject instead.
    import math

    import pytest

    for bad in (math.inf, -math.inf, math.nan):
        with pytest.raises(ValueError):
            build_window_delete("t", {"score": bad})
    # finite floats still render
    assert "score = 1.5" in build_window_delete("t", {"score": 1.5})


def test_build_window_delete_custom_wildcard_protects_literal_all():
    # 'ALL' as legitimate data: with a different sentinel the predicate
    # is kept instead of silently widening the DELETE.
    sql = build_window_delete("t", {"game_code": "ALL"}, wildcard="__ANY__")
    assert "game_code = 'ALL'" in sql
    sql2 = build_window_delete("t", {"game_code": "ALL"}, wildcard=None)
    assert "game_code = 'ALL'" in sql2
