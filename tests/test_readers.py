"""Source readers: JDBC option plumbing (no DB in this container).

The JDBC entry point mirrors the reference's MariaDB reads
(task-executor/trans_summary/trans_summary_5min.py:92-93) but
parallelized by partition ranges.  With no database available, the test
intercepts the DataFrameReader chain at the Python layer and asserts
the exact option keys Spark's JDBC source expects — a typo in
``partitionColumn``/``numPartitions``/``lowerBound``/``upperBound``
would silently serialize the whole scan through one connection in
production.
"""

from __future__ import annotations

import pytest
from pyspark.sql.readwriter import DataFrameReader

from tg_reporting_etl_spark.sources import readers


@pytest.fixture()
def captured_reader(monkeypatch):
    captured: dict = {}

    def fake_format(self, source):
        captured["format"] = source
        return self

    def fake_option(self, key, value):
        captured.setdefault("options", {})[key] = value
        return self

    def fake_load(self, *a, **kw):
        captured["loaded"] = True
        return "sentinel-df"

    monkeypatch.setattr(DataFrameReader, "format", fake_format)
    monkeypatch.setattr(DataFrameReader, "option", fake_option)
    monkeypatch.setattr(DataFrameReader, "load", fake_load)
    return captured


def test_read_jdbc_partitioned_option_plumbing(spark, captured_reader):
    out = readers.read_jdbc(
        spark,
        "jdbc:mysql://db:3306/report",
        "trans_summary_5min",
        partition_column="id",
        num_partitions=8,
        lower_bound=5,
        upper_bound=500,
        fetchsize="10000",
        user="etl",
    )
    assert out == "sentinel-df" and captured_reader["loaded"]
    assert captured_reader["format"] == "jdbc"
    assert captured_reader["options"] == {
        "url": "jdbc:mysql://db:3306/report",
        "dbtable": "trans_summary_5min",
        "partitionColumn": "id",
        "numPartitions": "8",  # stringified: JDBC options are string-typed
        "lowerBound": "5",
        "upperBound": "500",
        "fetchsize": "10000",  # passthrough options reach the reader
        "user": "etl",
    }


def test_read_jdbc_defaults_and_serial_path(spark, captured_reader):
    # bounds omitted -> documented defaults
    readers.read_jdbc(spark, "jdbc:mysql://db/x", "t", partition_column="k")
    assert captured_reader["options"]["lowerBound"] == "0"
    assert captured_reader["options"]["upperBound"] == "1000000"
    assert captured_reader["options"]["numPartitions"] == "32"

    # no partition column -> no range options at all (serial scan)
    captured_reader.clear()
    readers.read_jdbc(spark, "jdbc:mysql://db/x", "t")
    assert captured_reader["options"] == {"url": "jdbc:mysql://db/x", "dbtable": "t"}


def test_read_jsonl_permissive_quarantine(spark, tmp_path):
    """Explicit schema, malformed lines land in the corrupt column
    instead of killing the scan or vanishing."""
    import pyspark.sql.functions as F

    from tg_reporting_etl_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "beta"}\n'
    )
    df = read_jsonl(spark, str(p), schema="doc_id long, text string")
    # Spark disallows queries touching ONLY the corrupt column
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — always project a data
    # column alongside it, as documented on read_jsonl.
    rows = df.select("doc_id", "text", "_corrupt_record").collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert sorted(r.doc_id for r in good) == [1, 2]
    assert len(bad) == 1 and "NOT JSON" in bad[0]._corrupt_record


def test_read_jsonl_substring_column_does_not_mask_corrupt_capture(spark, tmp_path):
    """A user column merely CONTAINING the corrupt-record name as a
    substring (e.g. `old_corrupt_record_bak`) must not disable
    malformed-line capture: the field-name check is exact, so the real
    `_corrupt_record` column is still appended and populated."""
    from tg_reporting_etl_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "old_corrupt_record_bak": "x"}\n'
        "BROKEN LINE\n"
    )
    df = read_jsonl(
        spark, str(p), schema="doc_id long, old_corrupt_record_bak string"
    )
    assert "_corrupt_record" in df.columns
    rows = df.select("doc_id", "_corrupt_record").collect()
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 1 and "BROKEN" in bad[0]._corrupt_record


def test_fs_path_exists_probe(spark, tmp_path):
    """The bootstrap probe must track real FS state through any Hadoop
    scheme — and stay quiet (no analyzer pass, no stack trace)."""
    from tg_reporting_etl_spark.sources.readers import fs_path_exists

    p = str(tmp_path / "probe_target")
    assert not fs_path_exists(spark, p)
    spark.range(3).write.parquet(p)
    assert fs_path_exists(spark, p)
    # a plain file (not a dir) counts too — exists(), not isDirectory()
    f = tmp_path / "probe_file.txt"
    f.write_text("x")
    assert fs_path_exists(spark, str(f))


def test_read_if_committed_classifies_torn_vs_transient(spark, tmp_path):
    """None is reserved for KNOWN torn/absent-sink signatures; any other
    failure must RAISE (a None return can trigger a destructive
    bootstrap overwrite downstream — see submit_rerun_requests)."""
    import os

    import pytest

    from tg_reporting_etl_spark.sources import readers as rd

    # absent dir -> None (bootstrap)
    assert rd.read_parquet_if_committed(spark, str(tmp_path / "absent")) is None

    # existing-but-file-less dir, no schema -> schema inference fails
    # with the torn-sink signature -> None (bootstrap)
    torn = tmp_path / "torn"
    os.makedirs(torn / "_temporary")
    assert rd.read_parquet_if_committed(spark, str(torn)) is None

    # committed dir -> DataFrame
    good = str(tmp_path / "good")
    spark.range(5).write.parquet(good)
    assert rd.read_parquet_if_committed(spark, good).count() == 5

    # transient/unknown failure -> RAISES, never a silent bootstrap
    # (fake session: the real one is never mutated)
    class Boom(Exception):
        pass

    class _Reader:
        def schema(self, *_a):
            return self

        def parquet(self, *_a):
            raise Boom("connection reset by peer")

    class _FakeSpark:
        read = _Reader()

    real_probe = rd.fs_path_exists
    rd.fs_path_exists = lambda *_a: True
    try:
        with pytest.raises(Boom):
            rd.read_parquet_if_committed(_FakeSpark(), good)
    finally:
        rd.fs_path_exists = real_probe


def test_torn_sink_classification_prefers_error_class(spark, tmp_path):
    """The torn-sink check matches on exception type + Spark's stable
    error class first (message substrings are brittle across versions /
    locales); substrings remain only as fallback for class-less
    exceptions."""
    from pyspark.errors import AnalysisException

    from tg_reporting_etl_spark.sources import readers as rd

    # a REAL Spark error carries the structured class — capture one
    try:
        spark.read.parquet(str(tmp_path / "nope")).schema
        raise AssertionError("expected PATH_NOT_FOUND")
    except AnalysisException as exc:
        assert rd._is_torn_sink_error(exc)

    # structured class present but NOT a torn class -> False even if
    # the message happens to contain a torn substring
    class _Classed(AnalysisException):
        def __init__(self):  # noqa: D401
            Exception.__init__(self, "Path does not exist (but class says otherwise)")

        def getCondition(self):
            return "TABLE_OR_VIEW_NOT_FOUND"

        def getErrorClass(self):
            return "TABLE_OR_VIEW_NOT_FOUND"

        def __str__(self):
            return "Path does not exist (but class says otherwise)"

    assert not rd._is_torn_sink_error(_Classed())

    # class-less exception falls back to the substring check
    assert rd._is_torn_sink_error(RuntimeError("Unable to infer schema for Parquet"))
    assert not rd._is_torn_sink_error(RuntimeError("connection reset by peer"))
