"""Profiling and tracing hooks.

The reference's only observability is wall-clock timing around ``synthesize``
and a tqdm bar on the NFE loop (``/root/reference/vietvoicetts/core/
tts_engine.py:157-159,215,248``; SURVEY §5 lists tracing as absent). This
module adds the TPU-native equivalents:

- ``trace(...)``: context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace (XLA ops, HBM, fusion view);
- ``annotate(name)``: ``TraceAnnotation`` so host-side pipeline stages show
  up inside device traces;
- ``device_memory_stats()``: per-device HBM usage snapshot.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Optional

import jax

from .logging import get_logger

log = get_logger("profiling")


@contextmanager
def trace(log_dir: str = "/tmp/vietvoice-trace", host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a JAX/XLA profiler trace; view with TensorBoard or xprof."""
    log.info("Starting profiler trace → %s", log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("Profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named region that appears on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """HBM usage for one device (empty dict when unsupported)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:  # pragma: no cover — not all backends support this
        return {}
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: stats[k] for k in keep if k in stats}


def log_memory(prefix: str = "") -> None:
    stats = device_memory_stats()
    if stats:
        gib = 1024**3
        log.info(
            "%sHBM: %.2f GiB in use (peak %.2f / limit %.2f)",
            f"{prefix} " if prefix else "",
            stats.get("bytes_in_use", 0) / gib,
            stats.get("peak_bytes_in_use", 0) / gib,
            stats.get("bytes_limit", 0) / gib,
        )
