"""Configurable session timezone (reference task-producer/main.py:26-28:
``utc_timezone_switch`` flips the process TZ and every strftime-derived
date key follows).  Engine equivalent: ``SPARK_GRAFT_SESSION_TZ`` /
``get_spark(tz=...)`` set ``spark.sql.session.timeZone``; date-key
derivation (functions/core.int_date_key) and the DuckDB oracle (with
``SET TimeZone`` + ``timezone('UTC', ts)``) must agree in any zone."""

from __future__ import annotations

from datetime import datetime, timezone
from zoneinfo import ZoneInfo

import duckdb
import pyspark.sql.functions as F
import pytest

from tg_reporting_etl_spark.functions.core import int_date_key
from tg_reporting_etl_spark.sources.readers import load_table


@pytest.fixture()
def tz_session(spark, monkeypatch):
    """Yield a (set_tz, spark) pair restoring the original tz after."""
    original = spark.conf.get("spark.sql.session.timeZone")

    def set_tz(tz: str):
        monkeypatch.setenv("SPARK_GRAFT_SESSION_TZ", tz)
        spark.conf.set("spark.sql.session.timeZone", tz)

    yield set_tz, spark
    spark.conf.set("spark.sql.session.timeZone", original)


@pytest.mark.parametrize("tz", ["UTC", "Asia/Taipei"])
def test_date_key_follows_configured_tz(tz_session, sf_dir, tz):
    set_tz, spark = tz_session
    set_tz(tz)
    ev = load_table(spark, sf_dir, "events")
    assert spark.conf.get("spark.sql.session.timeZone") == tz  # load_table kept it

    got = {
        r.event_id: (r.dk, r.h)
        for r in ev.select(
            "event_id",
            int_date_key(F.col("ts")).alias("dk"),
            F.hour("ts").alias("h"),
        ).collect()
    }
    # expectation from first principles: the stored parquet value is a
    # UTC instant (read it with DuckDB, bypassing Spark entirely); the
    # configured zone's wall clock defines the date key
    zone = ZoneInfo(tz)
    con = duckdb.connect()
    raw = dict(
        con.execute(
            f"SELECT event_id, CAST(ts AS TIMESTAMP) FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        ).fetchall()
    )
    assert set(raw) == set(got)
    for eid, naive_utc in raw.items():
        wall = naive_utc.replace(tzinfo=timezone.utc).astimezone(zone)
        assert got[eid] == (
            wall.year * 10000 + wall.month * 100 + wall.day,
            wall.hour,
        )
    if tz != "UTC":
        # at least one event must actually shift its date key vs UTC
        # (events span many days; Taipei is +8h so ~1/3 of them cross)
        set_tz("UTC")
        utc_keys = {
            r.event_id: r.dk
            for r in load_table(spark, sf_dir, "events")
            .select("event_id", int_date_key(F.col("ts")).alias("dk"))
            .collect()
        }
        assert any(utc_keys[e] != got[e][0] for e in got)


@pytest.mark.parametrize("tz", ["UTC", "Asia/Taipei"])
def test_oracle_parity_in_configured_tz(tz_session, sf_dir, tz):
    """Spark per-day counts under the configured zone == DuckDB with
    SET TimeZone + timezone('UTC', ts) over the same parquet."""
    set_tz, spark = tz_session
    set_tz(tz)
    got = {
        (r.dk, r.n)
        for r in load_table(spark, sf_dir, "events")
        .groupBy(int_date_key(F.col("ts")).alias("dk"))
        .agg(F.count("*").alias("n"))
        .collect()
    }

    con = duckdb.connect()
    con.execute(f"SET TimeZone='{tz}'")
    want = set(
        con.execute(
            f"""
            SELECT CAST(year(t) * 10000 + month(t) * 100 + day(t) AS INT) AS dk,
                   count(*) AS n
            FROM (SELECT timezone('UTC', CAST(ts AS TIMESTAMP)) AS t
                  FROM read_parquet('{sf_dir}/events.parquet'))
            GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want
