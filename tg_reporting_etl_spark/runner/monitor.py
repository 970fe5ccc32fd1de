"""Monitoring / error-log layer (SURVEY §2.12).

Reference shape: every producer/executor step runs inside a retrying
pipeline (task-producer/utils/PipelineUtils.py:13-35 — 3 tries, then
give up); a failure appends one row to the ``error_log`` DB table
(monitor/ErrorHandler.py:12-20: pipeline, process, content, traceback)
and pushes an alert message (ErrorHandler.py:22-31; transport is a
Telegram bot HTTP call, monitor/TGMessage.py).

Spark-first equivalents:

- the error log is an append-only parquet table (the one sink in the
  engine where append, not overwrite, is correct — each failure is a
  distinct event);
- the alert transport is a ``Notifier`` protocol: tests and local runs
  use :class:`CollectingNotifier`; a production deployment plugs an
  HTTP-posting implementation with its own credentials.  No network
  call lives in this repo (the container has no egress, and bot
  credentials do not belong in code).
"""

from __future__ import annotations

import time
import traceback
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Callable, Protocol

from pyspark.sql import DataFrame, SparkSession

#: error_log schema — the reference's table plus an event timestamp.
ERROR_LOG_SCHEMA = (
    "pipeline string, process string, content string, traceback string, error_time timestamp"
)


def log_error(spark: SparkSession, path: str, record: dict[str, str]) -> None:
    """Append one failure event to the parquet error_log
    (ErrorHandler.raise_error_to_db, ErrorHandler.py:12-20)."""
    row = (
        record["pipeline"],
        record["process"],
        record["content"],
        record["traceback"],
        record.get("error_time") or datetime.now(timezone.utc).replace(tzinfo=None),
    )
    spark.createDataFrame([row], ERROR_LOG_SCHEMA).write.mode("append").parquet(path)


def read_error_log(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


class Notifier(Protocol):
    def send(self, message: str) -> None: ...


@dataclass
class CollectingNotifier:
    """In-memory notifier for tests / local runs."""

    messages: list[str] = field(default_factory=list)

    def send(self, message: str) -> None:
        self.messages.append(message)


@dataclass
class WebhookNotifier:
    """Generic HTTP-POST alert transport — the engine-side equivalent of
    the reference's bot-HTTP push (monitor/TGMessage.py:12-20, which
    GETs a chat-bot sendMessage endpoint with the alert text).

    Deliberately provider-agnostic: the deployment supplies ``url`` (and
    any auth headers) from ITS config — no endpoint, token, or chat id
    lives in this repo.  The message is POSTed as JSON ``{text_key:
    message}``, the shape most chat-webhook APIs accept.

    Delivery is retried ``tries`` times with ``delay_s`` between
    attempts, then the failure is SWALLOWED (after invoking
    ``on_failure`` if given): alerting is a side channel and must never
    take down the pipeline it reports on — the reference has the same
    posture, its send is fire-and-forget.

    ``transport(url, body_bytes, headers) -> status_code`` is injectable
    so tests (and exotic deployments) never open a socket; the default
    uses urllib from the standard library.
    """

    url: str
    headers: dict[str, str] = field(default_factory=dict)
    text_key: str = "text"
    tries: int = 3
    delay_s: float = 0.0
    timeout_s: float = 10.0
    transport: Callable[[str, bytes, dict[str, str]], int] | None = None
    on_failure: Callable[[str, Exception | None], None] | None = None

    def _default_transport(self, url: str, body: bytes, headers: dict[str, str]) -> int:
        import urllib.request

        req = urllib.request.Request(url, data=body, headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return int(resp.status)

    def send(self, message: str) -> None:
        import json as _json

        body = _json.dumps({self.text_key: message}).encode("utf-8")
        headers = {"Content-Type": "application/json", **self.headers}
        post = self.transport or self._default_transport
        last_exc: Exception | None = None
        for attempt in range(self.tries):
            try:
                status = post(self.url, body, headers)
                if 200 <= status < 300:
                    return
                last_exc = RuntimeError(f"webhook returned HTTP {status}")
            except Exception as exc:  # noqa: BLE001 — alert transport is a boundary
                last_exc = exc
            if attempt + 1 < self.tries and self.delay_s:
                time.sleep(self.delay_s)
        if self.on_failure is not None:
            self.on_failure(message, last_exc)


def format_alert(title: str, record: dict[str, str]) -> str:
    """The reference's alert body (ErrorHandler.send_alert_msg:22-29)."""
    return (
        f"***** {title} Error *****\n"
        f"pipeline: {record['pipeline']}\n"
        f"process: {record['process']}\n"
        f"content: {record['content']}\n\n"
        f"***** TRACEBACK *****\n"
        f"{record['traceback']}"
    )


def run_pipeline(
    steps: list[Callable[[Any, dict], Any]],
    ctx: dict,
    *,
    spark: SparkSession | None = None,
    error_log_path: str | None = None,
    notifier: Notifier | None = None,
    title: str = "tg-reporting-etl-spark",
    tries: int = 3,
    delay_s: float = 0.0,
) -> Any:
    """Run ``steps`` sequentially, threading ``data`` through
    (PipelineUtils.ProcessPipeline.run:13-35).

    Each step is retried ``tries`` times with ``delay_s`` between
    attempts (the reference's retry_call with tries=3, delay=5).  When a
    step exhausts its retries the failure is journaled + notified and
    the pipeline STOPS (the reference ``break``s — downstream steps
    depend on upstream data, so running them would cascade garbage).
    Returns the last successful step's data.
    """
    data = None
    for step in steps:
        name = getattr(step, "__name__", type(step).__name__)
        try:
            last_exc: Exception | None = None
            for attempt in range(tries):
                try:
                    data = step(data, ctx)
                    last_exc = None
                    break
                except Exception as exc:  # noqa: BLE001 — the pipeline is the boundary
                    last_exc = exc
                    if attempt + 1 < tries and delay_s:
                        time.sleep(delay_s)
            if last_exc is not None:
                raise last_exc
        except Exception as exc:  # noqa: BLE001
            record = {
                "pipeline": ctx.get("pipeline", "ProcessPipeline"),
                "process": name,
                "content": repr(exc),
                "traceback": traceback.format_exc(),
            }
            if spark is not None and error_log_path:
                log_error(spark, error_log_path, record)
            if notifier is not None:
                notifier.send(format_alert(title, record))
            break
    return data
