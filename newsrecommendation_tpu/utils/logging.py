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
