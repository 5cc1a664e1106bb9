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


def _tiny_cfg_kwargs(frames: int) -> dict:
    return dict(
        dit_dim=64, dit_depth=2, dit_heads=4, text_dim=32, text_conv_layers=1,
        vocoder_dim=64, vocoder_intermediate_dim=128, vocoder_num_layers=2,
        nfe_step=4, frame_buckets=(frames,), compute_dtype="float32",
        use_pallas=False, model_cache_dir="/tmp/vv_scaling_pack",
    )


def guard(out_path: str, frames: int = 128, per_device_batch: int = 2) -> int:
    """Virtual-mesh sharding regression guard (round-4 verdict #6).

    Wall time on the 8-virtual-device CPU mesh is useless (the 'devices'
    share 2 vCPUs; measured run-to-run spread 19-27%), so the guard records
    **compile-derived, deterministic** per-device numbers from XLA's own
    analyses of the fused chunk program:

    - ``flops`` / ``bytes accessed`` per device (``compiled.cost_analysis``)
      — batch sharding broken ⇒ per-device flops jump toward the unsharded
      number;
    - argument/output/temp bytes per device (``memory_analysis``) — TP
      weight shards accidentally replicated ⇒ argument bytes jump to the
      full model size.

    Ideal values: dp8 per-device flops ≈ single (same rows/device); tp4
    per-device flops ≈ single/4 + collective overhead; tp4 argument bytes ≈
    weights/4. Compare ``BENCH_SCALING_r{N}.json`` across rounds — any
    material ratio shift is a sharding regression, caught before a pod
    slice exists.
    """
    import jax

    from vietvoice_tts_tpu.config import ModelConfig
    from vietvoice_tts_tpu.parallel.mesh import make_mesh
    from vietvoice_tts_tpu.parallel.sharding import shard_batch
    from vietvoice_tts_tpu.pipeline.engine import TTSEngine

    n_dev = len(jax.devices())
    if n_dev < 8:
        log(f"guard wants 8 virtual devices, found {n_dev} — set "
            "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8")
        return 1
    hop = 256
    # DiT-heavy guard spec: with the --tiny dims (dim 64 × 2 layers) the
    # UNSHARDED DSP ends (1024-point DFT frontend, iSTFT head) dominate the
    # flops and the tp4 ratio sits near 1.0 regardless of sharding health.
    # At dim 256 × 6 layers the transformer carries most of the flops, so a
    # TP regression (weights replicated, collective gone) moves the ratio
    # sharply.
    guard_cfg = dict(
        dit_dim=256, dit_depth=6, dit_heads=8, text_dim=64, text_conv_layers=1,
        vocoder_dim=128, vocoder_intermediate_dim=256, vocoder_num_layers=2,
        nfe_step=4, frame_buckets=(frames,), compute_dtype="float32",
        use_pallas=False, model_cache_dir="/tmp/vv_scaling_guard_pack",
    )
    configs = {
        "single": dict(data=1, model=1, mesh=False),
        "dp8": dict(data=8, model=1, mesh=True),
        "tp4": dict(data=1, model=4, mesh=True),
        "dp2_tp4": dict(data=2, model=4, mesh=True),
        # Sequence parallelism spends the model axis on frames instead of
        # weight shards (params replicate, attention goes through
        # parallel/sequence). Recording it here gives the long-context mode
        # a standing, deterministic cost record next to TP — argument
        # bytes ≈ single (replicated weights) is EXPECTED for sp4, not a
        # regression; flops/device should drop with the frame split.
        "sp4": dict(data=1, model=4, mesh=True, sp=True),
    }
    entries = {}
    for name, c in configs.items():
        dp, tp = c["data"], c["model"]
        mesh = (
            make_mesh(data=dp, model=tp, devices=jax.devices()[: dp * tp])
            if c["mesh"]
            else None
        )
        b = per_device_batch * dp
        cfg = ModelConfig(
            max_batch_size=b, sequence_parallel=bool(c.get("sp")), **guard_cfg
        )
        engine = TTSEngine(cfg, mesh=mesh)
        core = engine.engine_core
        rng = np.random.default_rng(0)
        args = [
            rng.uniform(-0.5, 0.5, (b, frames * hop)).astype(core.transfer_dtype),
            np.full((b,), frames // 8, np.int32),
            np.full((b, frames), -1, np.int32),
            np.full((b,), frames, np.int32),
            np.arange(b, dtype=np.uint32),
        ]
        args[2][:, : frames // 4] = 7
        if mesh is not None:
            args = shard_batch(mesh, *args)
        fn = core.chunk_fn(b, frames)
        compiled = fn.lower(core.params, *args).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else (ca or {})
        try:
            ma = compiled.memory_analysis()
        except Exception:  # pragma: no cover — backend without the API
            ma = None
        entries[name] = {
            "data": dp, "model": tp, "batch": b,
            "flops_per_device": ca.get("flops"),
            "bytes_accessed_per_device": ca.get("bytes accessed"),
            "argument_bytes": getattr(ma, "argument_size_in_bytes", None),
            "output_bytes": getattr(ma, "output_size_in_bytes", None),
            "temp_bytes": getattr(ma, "temp_size_in_bytes", None),
        }
        flops = ca.get("flops")
        flops_s = f"{flops:.3e}" if flops is not None else "n/a"
        arg_kib = (getattr(ma, "argument_size_in_bytes", 0) or 0) >> 10
        log(f"[guard] {name}: dp={dp} tp={tp} batch={b} "
            f"flops/dev {flops_s} args {arg_kib} KiB")
        engine.cleanup()

    single = entries["single"]
    ratios = {}
    for k, v in entries.items():
        ratios[k] = {
            "flops": round(v["flops_per_device"] / single["flops_per_device"], 4)
            if v["flops_per_device"] and single["flops_per_device"] else None,
            "argument_bytes": round(v["argument_bytes"] / single["argument_bytes"], 4)
            if v["argument_bytes"] and single["argument_bytes"] else None,
        }
    record = {
        "metric": "virtual_mesh_sharding_guard",
        "backend": "cpu-virtual-8dev",
        "frames": frames,
        "per_device_batch": per_device_batch,
        "configs": entries,
        "ratio_vs_single": ratios,
        "healthy_baselines_r05": {
            "dp8": {"flops": 1.0003, "argument_bytes": 1.0},
            "tp4": {"flops": 0.7614, "argument_bytes": 0.6117},
            "dp2_tp4": {"flops": 0.7615, "argument_bytes": 0.6117},
            "sp4": {"flops": 0.2568, "argument_bytes": 1.0},
        },
        "note": (
            "Compile-derived per-device numbers (deterministic; wall time "
            "on the shared-vCPU virtual mesh is 19-27% noisy, measured). "
            "dp8 flops ratio ≈ 1.0 = rows split exactly evenly. tp4 sits "
            "at ~0.76 flops / ~0.61 argument bytes rather than 0.25 "
            "because the DSP ends (1024-point DFT frontend, iSTFT head) "
            "and norms are deliberately unsharded at guard dims — the "
            "pinned healthy_baselines are the reference. sp4 (sequence "
            "parallelism) splits FRAMES: flops ≈ 0.26 (everything is "
            "frame-parallel, attention pays the collective overhead) with "
            "argument bytes ≈ 1.0 — replicated weights are the DESIGN "
            "there, not a regression. A tp4 ratio jumping toward 1.0 (or "
            "dp8 toward 8.0) means sharding regressed to replication."
        ),
    }
    text = json.dumps(record, indent=1)
    with open(out_path, "w") as fh:
        fh.write(text)
    print(text)
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny dims for CPU methodology runs")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument(
        "--guard", metavar="OUT_JSON", default=None,
        help="run the virtual-mesh sharding regression guard and write the "
        "artifact here (needs the 8-virtual-device CPU mesh)",
    )
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    if args.guard:
        raise SystemExit(guard(args.guard, frames=args.frames or 128,
                               per_device_batch=args.per_device_batch))

    from vietvoice_tts_tpu.config import ModelConfig
    from vietvoice_tts_tpu.parallel.mesh import make_mesh
    from vietvoice_tts_tpu.pipeline.engine import TTSEngine

    n_dev = len(jax.devices())
    frames = args.frames or (128 if args.tiny else 1024)
    if args.tiny:
        cfg_kwargs = _tiny_cfg_kwargs(frames)
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
