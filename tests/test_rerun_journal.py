"""Rerun-request journaling: consumed requests are marked applied and a
replayed scan is a no-op (GetRelatedTimeSplit.py:87-96)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tg_reporting_etl_spark.runner.rerun import (
    consume_rerun_requests,
    submit_rerun_requests,
)

NOW = "2024-01-10 00:00:00"

_SCHEMA = (
    "platform string, site_code string, game_code string, report_class string, "
    "gte_time timestamp, lt_time timestamp, `5min` int, `1h` int, `1d` int, `1m` int"
)


def _req(spark, gte, lt, flags=(1, 1, 1, 0)):
    from datetime import datetime

    return spark.createDataFrame(
        [
            (
                "P1",
                "S1",
                "ALL",
                "trans_summary",
                datetime.fromisoformat(gte),
                datetime.fromisoformat(lt),
                *flags,
            )
        ],
        _SCHEMA,
    )


def test_consume_marks_applied_and_replay_is_noop(spark, tmp_path):
    path = str(tmp_path / "rerun_journal")
    submit_rerun_requests(spark, path, _req(spark, "2024-01-02 00:10:00", "2024-01-02 03:20:00"))

    tasks = consume_rerun_requests(spark, path, NOW)
    n = tasks.count()
    assert n > 0
    # 5min windows keep raw bounds; 1h floored/ceiled; 1d covers the day
    assert tasks.filter(F.col("freq_type") == "5min").count() == 38
    assert tasks.filter(F.col("freq_type") == "1H").count() == 4
    assert tasks.filter(F.col("freq_type") == "1D").count() == 1

    journal = spark.read.parquet(path)
    row = journal.collect()[0]
    assert row.done == 1 and str(row.apply_time) == NOW

    # replay: nothing pending -> empty expansion
    assert consume_rerun_requests(spark, path, NOW).count() == 0


def test_later_submission_expands_only_new_request(spark, tmp_path):
    path = str(tmp_path / "rerun_journal")
    submit_rerun_requests(spark, path, _req(spark, "2024-01-02 00:00:00", "2024-01-02 01:00:00"))
    consume_rerun_requests(spark, path, NOW)

    submit_rerun_requests(spark, path, _req(spark, "2024-01-03 00:00:00", "2024-01-03 01:00:00"))
    tasks = consume_rerun_requests(spark, path, NOW)
    assert tasks.count() > 0
    days = {r.gte_time.day for r in tasks.select("gte_time").collect()}
    assert days == {3}

    journal = spark.read.parquet(path)
    assert journal.count() == 2 and journal.filter(F.col("done") == 0).count() == 0


def test_resubmitting_applied_request_is_consumed_again(spark, tmp_path):
    """Reference semantics (ScanRerunManually.py:19-25): an operator may
    re-INSERT an identical request after it was applied and have it
    expanded again — the merge re-activates the applied row."""
    path = str(tmp_path / "rerun_journal")
    req = _req(spark, "2024-01-02 00:00:00", "2024-01-02 01:00:00")
    submit_rerun_requests(spark, path, req)
    first = consume_rerun_requests(spark, path, NOW).count()
    assert first > 0

    submit_rerun_requests(spark, path, req)  # applied -> re-activated
    journal = spark.read.parquet(path)
    assert journal.count() == 1 and journal.collect()[0].done == 0
    assert consume_rerun_requests(spark, path, NOW).count() == first
    assert consume_rerun_requests(spark, path, NOW).count() == 0


def test_duplicate_submit_while_pending_is_noop(spark, tmp_path):
    """A duplicate of a still-pending request must not double-expand."""
    path = str(tmp_path / "rerun_journal")
    req = _req(spark, "2024-01-02 00:00:00", "2024-01-02 01:00:00")
    submit_rerun_requests(spark, path, req)
    submit_rerun_requests(spark, path, req)
    assert spark.read.parquet(path).count() == 1
    assert consume_rerun_requests(spark, path, NOW).count() > 0
    assert consume_rerun_requests(spark, path, NOW).count() == 0


def test_torn_journal_dir_bootstraps_not_throws(spark, tmp_path):
    # Journal dir existing but file-less (crash mid-bootstrap): submit
    # must bootstrap and consume must treat it as empty (ADVICE r9).
    path = tmp_path / "journal"
    (path / "_temporary").mkdir(parents=True)
    assert consume_rerun_requests(spark, str(path), NOW).count() == 0
    submit_rerun_requests(spark, str(path), _req(spark, "2024-01-01 00:00:00", "2024-01-01 00:05:00"))
    got = consume_rerun_requests(spark, str(path), NOW)
    assert got.count() > 0


def test_journal_step_job_ceilings(spark, tmp_path):
    """Round-12 orchestration-floor contract, pinned by the scheduler's
    own accounting: every journal step runs inside control_scope (AQE
    off, 1 shuffle partition — the journal is metadata-sized by
    contract), so submit is ONE job (bootstrap write, or union+window+
    swap-write as one non-adaptive DAG) and consume is THREE (snapshot
    read, applied rewrite, + the committed-read probe's heal path).
    This test fails if per-step job creep returns."""
    path = str(tmp_path / "journal")
    sc = spark.sparkContext
    tr = sc.statusTracker()

    def jobs_of(group, fn):
        sc.setJobGroup(group, group)
        fn()
        sc.setJobGroup(None, None)
        return len(tr.getJobIdsForGroup(group) or [])

    j_boot = jobs_of(
        "jl_boot",
        lambda: submit_rerun_requests(
            spark, path, _req(spark, "2024-01-01 00:00:00", "2024-01-01 00:05:00")
        ),
    )
    j_merge = jobs_of(
        "jl_merge",
        lambda: submit_rerun_requests(
            spark, path, _req(spark, "2024-01-02 00:00:00", "2024-01-02 00:05:00")
        ),
    )
    # consume's internal actions only — the returned cascade stays lazy
    j_consume = jobs_of("jl_consume", lambda: consume_rerun_requests(spark, path, NOW))
    assert j_boot <= 1, f"bootstrap submit grew to {j_boot} jobs"
    assert j_merge <= 1, f"merge submit grew to {j_merge} jobs"
    assert j_consume <= 3, f"consume grew to {j_consume} jobs"


def test_control_scope_restores_confs(spark):
    """control_scope must restore AQE + shuffle partitions even on
    error — a leaked AQE-off would silently de-adapt every data-sized
    plan that follows."""
    import pytest

    from tg_reporting_etl_spark.sources.writers import control_scope

    before = (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )
    with control_scope(spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
    with pytest.raises(RuntimeError):
        with control_scope(spark):
            raise RuntimeError("boom")
    after = (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )
    assert after == before


def test_journal_schema_declaration_matches_disk(spark, tmp_path):
    """JOURNAL_SCHEMA skips footer inference, so pin declaration ==
    inference against a real journal written by submit."""
    from tg_reporting_etl_spark.runner.rerun import JOURNAL_SCHEMA

    path = str(tmp_path / "journal")
    submit_rerun_requests(spark, path, _req(spark, "2024-01-01 00:00:00", "2024-01-01 00:05:00"))
    inferred = {f.name: f.dataType.simpleString() for f in spark.read.parquet(path).schema}
    declared = {
        f.name: f.dataType.simpleString()
        for f in spark.read.schema(JOURNAL_SCHEMA).parquet(path).schema
    }
    assert inferred == declared
