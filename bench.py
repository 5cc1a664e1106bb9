#!/usr/bin/env python
"""Benchmark harness: audio-seconds/s/chip for the fused TPU pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the driver target of 20x realtime audio-seconds/s/chip
(BASELINE.md — the reference publishes no numbers of its own;
`BASELINE.json.published == {}`), so vs_baseline = value / 20.

Measures the full device pipeline (mel front-end → scan(NFE x CFG-doubled
DiT) → vocoder) on the largest shipping bucket, plus p50 end-to-end latency
for a short-sentence request through the public client API.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from vietvoice_tts_tpu.config import ModelConfig
    from vietvoice_tts_tpu.pipeline.engine import TTSEngine

    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    cfg = ModelConfig()
    engine = TTSEngine(cfg)
    core = engine.engine_core
    hop = cfg.hop_length
    sr = cfg.sample_rate

    # ---- Device pipeline throughput (config 4: batched synthesis) ----
    batch, n_frames = 8, 1024
    ref_frames, total_frames = 250, 1024
    rng = np.random.default_rng(0)
    wave = rng.uniform(-0.5, 0.5, (batch, n_frames * hop)).astype(np.float32)
    ref_len = np.full((batch,), ref_frames, np.int32)
    total_len = np.full((batch,), total_frames, np.int32)
    text_ids = np.full((batch, n_frames), -1, np.int32)
    text_ids[:, :300] = 7

    log(f"compiling B={batch} N={n_frames} nfe={cfg.nfe_step} ...")
    t0 = time.perf_counter()
    core.synthesize_batch(wave, ref_len, text_ids, total_len)
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    # Steady-state serving throughput: dispatch batches back-to-back the way
    # the micro-batcher does (async dispatch, ≤2 in flight), so host↔device
    # transfer overlaps device compute.
    iters = 4
    t0 = time.perf_counter()
    fetches = []
    for i in range(iters):
        fetches.append(
            core.synthesize_batch_async(wave, ref_len, text_ids, total_len, seed=i)
        )
        if len(fetches) > 2:
            fetches.pop(0)()
    for f in fetches:
        f()
    step_time = (time.perf_counter() - t0) / iters
    generated_audio_s = batch * (total_frames - ref_frames) * hop / sr
    rtf = generated_audio_s / step_time
    log(f"batch pipeline: {step_time * 1e3:.1f} ms/batch -> {generated_audio_s:.1f} "
        f"audio-s/batch -> {rtf:.1f}x realtime/chip (pipelined, {iters} batches)")

    # ---- p50 short-sentence latency through the public API (config 1) ----
    text = "Xin chào, đây là bài kiểm tra tổng hợp giọng nói tiếng Việt."
    engine.synthesize(text)  # warm the short bucket
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        engine.synthesize(text)
        lat.append(time.perf_counter() - t0)
    p50_latency = statistics.median(lat)
    log(f"p50 short-sentence latency: {p50_latency * 1e3:.0f} ms")

    baseline_rtf = 20.0  # driver target (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "audio_s_per_s_per_chip",
                "value": round(rtf, 2),
                "unit": "audio_s/s",
                "vs_baseline": round(rtf / baseline_rtf, 3),
                "p50_latency_ms": round(p50_latency * 1e3, 1),
                "backend": backend,
                "nfe_step": cfg.nfe_step,
                "batch": batch,
                "frames": n_frames,
            }
        )
    )


if __name__ == "__main__":
    main()
