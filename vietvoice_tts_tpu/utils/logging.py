"""Structured logging for the framework.

The reference uses ``loguru`` everywhere (e.g. chunk plans at
``/root/reference/vietvoicetts/core/tts_engine.py:70``); loguru is not part of
this image, so we provide an equivalent thin layer over stdlib ``logging`` with
the same call surface (``logger.info/debug/warning/error``) plus per-stage
timing helpers used by the TPU pipeline's observability hooks.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from contextlib import contextmanager

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s:%(lineno)d - %(message)s"
_configured = False


def _configure_root() -> None:
    global _configured
    if _configured:
        return
    level = os.environ.get("VIETVOICE_LOG_LEVEL", "INFO").upper()
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT))
    root = logging.getLogger("vietvoice_tts_tpu")
    root.addHandler(handler)
    root.setLevel(getattr(logging, level, logging.INFO))
    root.propagate = False
    _configured = True


def get_logger(name: str = "vietvoice_tts_tpu") -> logging.Logger:
    _configure_root()
    if not name.startswith("vietvoice_tts_tpu"):
        name = f"vietvoice_tts_tpu.{name}"
    return logging.getLogger(name)


logger = get_logger()


class StageTimer:
    """Accumulates wall-clock per named pipeline stage.

    Replaces the reference's single end-to-end ``time.time()`` pair
    (``core/tts_engine.py:215,248``) with per-stage observability
    (preprocess / denoise / vocode / host-DSP), reported by the engine and
    the benchmark harness.
    """

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict[str, float]:
        return dict(self.totals)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
