"""Structured logging for the framework.

The reference pins loguru but never calls it (SURVEY.md §5); we provide plain
stdlib logging plus an optional JSONL metrics emitter used by the bench
harness.
"""

from __future__ import annotations

import json
import logging
import sys
import time

_FORMAT = "%(asctime)s %(levelname)s %(name)s: %(message)s"


def get_logger(name: str = "torch_random_walk_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


class MetricsWriter:
    """Append-only JSONL metrics sink (step metrics, bench results)."""

    def __init__(self, path: str | None):
        self._fh = open(path, "a") if path else None

    def emit(self, **metrics):
        record = {"ts": time.time(), **metrics}
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        return record

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
