"""Rotating application logs for the Python-side orchestration layer
(the last reference behavior the engine did not mirror).

Reference shape: ``get_report_logger`` builds a ``report_app`` logger
with two midnight-rotating files — one at INFO, one at ERROR — with
``%Y%m%d`` suffixes (task-producer/utils/TaskUtils.py:117-139 and the
identical task-executor/utils/ExecUtils.py:86-108).

Scope note: this covers the DRIVER-side orchestration chatter (daemon
ticks, producer/executor progress, retry notices).  Executor-side Spark
logging stays with log4j, where it belongs — shipping Python handlers
to executors would be the wrong layer.
"""

from __future__ import annotations

import logging
import os
import re
from logging.handlers import TimedRotatingFileHandler

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(funcName)s - %(message)s"


def get_report_logger(
    name: str = "report_app",
    log_dir: str = ".",
    base: str = "TaskRunner",
    when: str = "midnight",
    backup_count: int = 0,
) -> logging.Logger:
    """The reference's two-file rotating logger, parameterized: a
    ``{base}_normal.log`` capturing INFO+ and a ``{base}_error.log``
    capturing ERROR+ only, both rotating at ``when`` with day-stamped
    (``YYYYMMDD``) suffixes.  Idempotent per (name, dir, base): calling
    again returns the same logger without stacking duplicate handlers
    (the reference re-calls get_report_logger per pipeline and would
    double-log; guarding on handler identity fixes that quietly)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    # File-only, like the reference's logger shape: without this, every
    # record also flows to root-logger handlers and duplicates on the
    # console in any deployment (or test harness) that configured root.
    logger.propagate = False
    targets = {
        f"{log_dir}/{base}_normal.log": logging.INFO,
        f"{log_dir}/{base}_error.log": logging.ERROR,
    }
    existing = {
        getattr(h, "baseFilename", None) for h in logger.handlers
    }
    formatter = logging.Formatter(_FORMAT)
    for path, level in targets.items():
        # Duplicate check BEFORE constructing the handler — the
        # constructor opens (touches) the file as a side effect, and
        # baseFilename is the abspath of the target.
        if os.path.abspath(path) in existing:
            continue
        handler = TimedRotatingFileHandler(
            path, when=when, interval=1, backupCount=backup_count
        )
        handler.setLevel(level)
        handler.setFormatter(formatter)
        handler.suffix = "%Y%m%d"
        handler.extMatch = re.compile(r"^\d{8}$")
        logger.addHandler(handler)
    return logger
