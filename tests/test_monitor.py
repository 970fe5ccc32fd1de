"""Monitoring layer: retrying pipeline, error_log parquet, alert format."""

from __future__ import annotations

from tg_reporting_etl_spark.runner.monitor import (
    CollectingNotifier,
    format_alert,
    read_error_log,
    run_pipeline,
)


def test_retry_then_success_leaves_no_error(spark, tmp_path):
    path = str(tmp_path / "error_log")
    notifier = CollectingNotifier()
    attempts = {"n": 0}

    def flaky(data, ctx):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    out = run_pipeline(
        [flaky], {}, spark=spark, error_log_path=path, notifier=notifier, tries=3
    )
    assert out == "ok" and attempts["n"] == 3
    assert notifier.messages == []
    import os

    assert not os.path.exists(path)


def test_failure_journals_notifies_and_stops(spark, tmp_path):
    path = str(tmp_path / "error_log")
    notifier = CollectingNotifier()
    ran = []

    def boom(data, ctx):
        raise ValueError("bad input")

    def downstream(data, ctx):
        ran.append(True)
        return data

    run_pipeline(
        [boom, downstream],
        {"pipeline": "TestPipeline"},
        spark=spark,
        error_log_path=path,
        notifier=notifier,
        tries=2,
    )
    assert ran == []  # pipeline stopped at the failed step
    log = read_error_log(spark, path).collect()
    assert len(log) == 1
    row = log[0]
    assert row.pipeline == "TestPipeline" and row.process == "boom"
    assert "ValueError" in row.content and "bad input" in row.traceback
    assert row.error_time is not None
    assert len(notifier.messages) == 1
    msg = notifier.messages[0]
    assert "pipeline: TestPipeline" in msg and "process: boom" in msg
    assert "TRACEBACK" in msg


def test_error_log_appends_across_failures(spark, tmp_path):
    path = str(tmp_path / "error_log")

    def boom(data, ctx):
        raise RuntimeError("x")

    for _ in range(2):
        run_pipeline([boom], {}, spark=spark, error_log_path=path, tries=1)
    assert read_error_log(spark, path).count() == 2


def test_alert_format_mirrors_reference():
    rec = {"pipeline": "P", "process": "S", "content": "repr", "traceback": "tb"}
    msg = format_alert("title", rec)
    assert msg.startswith("***** title Error *****\n")
    assert "content: repr" in msg and msg.endswith("tb")


# ------------------------------------------------------------- webhook


def test_webhook_posts_json_payload_once_on_success():
    from tg_reporting_etl_spark.runner.monitor import WebhookNotifier

    calls = []

    def transport(url, body, headers):
        calls.append((url, body, headers))
        return 200

    n = WebhookNotifier(url="https://example.invalid/hook", transport=transport)
    n.send("hello alert")

    assert len(calls) == 1
    url, body, headers = calls[0]
    assert url == "https://example.invalid/hook"
    import json

    assert json.loads(body) == {"text": "hello alert"}
    assert headers["Content-Type"] == "application/json"


def test_webhook_retries_on_error_then_succeeds():
    from tg_reporting_etl_spark.runner.monitor import WebhookNotifier

    attempts = []

    def flaky(url, body, headers):
        attempts.append(1)
        if len(attempts) < 3:
            raise ConnectionError("net down")
        return 204

    failed = []
    n = WebhookNotifier(
        url="u", transport=flaky, tries=3, on_failure=lambda m, e: failed.append(m)
    )
    n.send("msg")
    assert len(attempts) == 3
    assert failed == []  # third attempt succeeded


def test_webhook_exhausted_retries_swallow_and_report():
    from tg_reporting_etl_spark.runner.monitor import WebhookNotifier

    failed = []

    def always_500(url, body, headers):
        return 500

    n = WebhookNotifier(
        url="u",
        transport=always_500,
        tries=2,
        on_failure=lambda m, e: failed.append((m, str(e))),
    )
    n.send("msg")  # must NOT raise — alerting never takes down the pipeline
    assert failed == [("msg", "webhook returned HTTP 500")]


def test_webhook_satisfies_notifier_protocol_in_pipeline(spark, tmp_path):
    """A failing pipeline step alerts through the webhook transport."""
    from tg_reporting_etl_spark.runner.monitor import WebhookNotifier, run_pipeline

    posts = []
    n = WebhookNotifier(url="u", transport=lambda u, b, h: (posts.append(b), 200)[1])

    def boom(data, ctx):
        raise ValueError("kaput")

    run_pipeline([boom], {"pipeline": "p"}, notifier=n, tries=1)
    assert len(posts) == 1
    assert b"kaput" in posts[0]


# ------------------------------------------------------------- app logs


def test_report_logger_two_rotating_files(tmp_path):
    """INFO lands only in the normal log; ERROR lands in both — the
    reference's two-handler split (TaskUtils.get_report_logger)."""
    from tg_reporting_etl_spark.runner.applog import get_report_logger

    lg = get_report_logger("t_report_app", log_dir=str(tmp_path), base="T")
    lg.info("routine tick")
    lg.error("kaboom")
    for h in lg.handlers:
        h.flush()

    normal = (tmp_path / "T_normal.log").read_text()
    error = (tmp_path / "T_error.log").read_text()
    assert "routine tick" in normal and "kaboom" in normal
    assert "kaboom" in error and "routine tick" not in error


def test_report_logger_idempotent_no_duplicate_handlers(tmp_path):
    from tg_reporting_etl_spark.runner.applog import get_report_logger

    lg1 = get_report_logger("t_report_app2", log_dir=str(tmp_path), base="U")
    n = len(lg1.handlers)
    lg2 = get_report_logger("t_report_app2", log_dir=str(tmp_path), base="U")
    assert lg2 is lg1 and len(lg2.handlers) == n  # no stacking

    lg2.info("once")
    for h in lg2.handlers:
        h.flush()
    assert (tmp_path / "U_normal.log").read_text().count("once") == 1


def test_report_logger_does_not_propagate_to_root(tmp_path, capsys):
    """File-only logger: records must not duplicate onto root handlers
    (ADVICE r9 — propagate left on double-logs in any root-configured
    deployment)."""
    import logging

    from tg_reporting_etl_spark.runner.applog import get_report_logger

    root_records = []

    class Catcher(logging.Handler):
        def emit(self, record):
            root_records.append(record.getMessage())

    catcher = Catcher()
    logging.getLogger().addHandler(catcher)
    try:
        lg = get_report_logger("t_report_app3", log_dir=str(tmp_path), base="V")
        assert lg.propagate is False
        lg.info("quiet tick")
    finally:
        logging.getLogger().removeHandler(catcher)
    assert "quiet tick" not in root_records
