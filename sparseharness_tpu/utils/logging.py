"""Severity-leveled logging with file:line headers.

Replaces the reference's hand-rolled Logger (inc/util/Logger.h:63-91,
src/util/Logger.cpp) with stdlib logging configured to the same shape:
per-module loggers, severity gate, ``file:line`` in the header.
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "[%(levelname)s] %(name)s %(filename)s:%(lineno)d: %(message)s"
_configured = False


def _configure() -> None:
    global _configured
    if _configured:
        return
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT))
    root = logging.getLogger("sparseharness_tpu")
    root.addHandler(handler)
    root.propagate = False
    level = os.environ.get("SPARSEHARNESS_TPU_LOG", "WARNING").upper()
    root.setLevel(getattr(logging, level, logging.WARNING))
    _configured = True


def get_logger(name: str) -> logging.Logger:
    _configure()
    if not name.startswith("sparseharness_tpu"):
        name = f"sparseharness_tpu.{name}"
    return logging.getLogger(name)


def set_log_level(level: str) -> None:
    _configure()
    logging.getLogger("sparseharness_tpu").setLevel(
        getattr(logging, level.upper())
    )
