"""Structured logging for the engine (replaces the reference's bare
prints, run_spatten_llama.py:83 / TestSpAtten.scala:213)."""

from __future__ import annotations

import logging
import sys


def get_logger(name: str = "spatten_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger
