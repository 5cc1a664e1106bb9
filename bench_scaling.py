#!/usr/bin/env python
"""Scaling-efficiency harness: per-device throughput at 1 vs N devices.

BASELINE.md targets ≥85% scaling efficiency at 2 hosts. Real multi-chip
hardware is not available in this container (one v5e chip via tunnel), so
this harness measures *weak scaling* of the data-parallel chunk program over
however many devices the current backend exposes — which is the real TPU
measurement protocol, runnable unchanged on a pod slice, and a methodology
check on the virtual CPU mesh meanwhile:

    # virtual 8-device methodology run (numbers are CPU-meaningless):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py --tiny

Prints one JSON line: per-device audio-s/s at dp=1 and dp=N, and efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny dims for CPU methodology runs")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--per-device-batch", type=int, default=2)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    from vietvoice_tts_tpu.config import ModelConfig
    from vietvoice_tts_tpu.parallel.mesh import make_mesh
    from vietvoice_tts_tpu.pipeline.engine import TTSEngine

    n_dev = len(jax.devices())
    frames = args.frames or (128 if args.tiny else 1024)
    if args.tiny:
        cfg_kwargs = dict(
            dit_dim=64, dit_depth=2, dit_heads=4, text_dim=32, text_conv_layers=1,
            vocoder_dim=64, vocoder_intermediate_dim=128, vocoder_num_layers=2,
            nfe_step=4, frame_buckets=(frames,), compute_dtype="float32",
            use_pallas=False, model_cache_dir="/tmp/vv_scaling_pack",
        )
    else:
        cfg_kwargs = dict(frame_buckets=(frames,))

    hop = 256
    results = {}
    for dp in (1, n_dev):
        mesh = make_mesh(data=dp, model=1, devices=jax.devices()[:dp]) if dp > 1 else None
        cfg = ModelConfig(max_batch_size=args.per_device_batch * dp, **cfg_kwargs)
        engine = TTSEngine(cfg, mesh=mesh)
        core = engine.engine_core
        b = args.per_device_batch * dp
        rng = np.random.default_rng(0)
        wave = rng.uniform(-0.5, 0.5, (b, frames * hop)).astype(np.float32)
        ref_len = np.full((b,), frames // 8, np.int32)
        total_len = np.full((b,), frames, np.int32)
        text_ids = np.full((b, frames), -1, np.int32)
        text_ids[:, : frames // 4] = 7
        core.synthesize_batch(wave, ref_len, text_ids, total_len)  # compile
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            core.synthesize_batch(wave, ref_len, text_ids, total_len, seed=i)
            times.append(time.perf_counter() - t0)
        audio_s = b * (frames - frames // 8) * hop / cfg.sample_rate
        per_device = audio_s / min(times) / dp
        results[dp] = per_device
        log(f"dp={dp}: batch={b} -> {per_device:.2f} audio-s/s/device")
        engine.cleanup()

    efficiency = results[n_dev] / results[1] if results[1] > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(efficiency, 3),
                "unit": "ratio",
                "devices": n_dev,
                "per_device_audio_s_per_s": {str(k): round(v, 2) for k, v in results.items()},
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
