"""Logging setup matching the reference's format (utils.py:20-33)."""

from __future__ import annotations

import dataclasses
import logging
import sys


def setup_logger(level: int = logging.INFO) -> logging.Logger:
    root = logging.getLogger()
    root.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler) for h in root.handlers):
        handler = logging.StreamHandler(sys.stdout)
        handler.setLevel(level)
        handler.setFormatter(logging.Formatter("[%(levelname)s %(asctime)s] %(message)s"))
        root.addHandler(handler)
    return root


def dump_config(cfg) -> None:
    """Log every config field at startup (reference utils.py:30-33)."""
    for f in dataclasses.fields(cfg):
        logging.info("config[%s]=%s", f.name, getattr(cfg, f.name))


class MetricsLog:
    """Append-only JSONL metrics sink (model_dir/metrics.jsonl).

    Machine-readable counterpart of the stdout log lines — one JSON object
    per train log point / eval result, for dashboards and run comparison.
    The reference has no structured metrics output (SURVEY.md §5
    observability). Rank-gated by the caller: only process 0 writes.
    """

    def __init__(self, path):
        import os

        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", encoding="utf-8", buffering=1)

    def write(self, kind: str, **fields) -> None:
        import json
        import time

        rec = {"kind": kind, "ts": round(time.time(), 3)}
        rec.update(fields)
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()
