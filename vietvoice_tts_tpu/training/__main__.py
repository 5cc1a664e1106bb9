"""``python -m vietvoice_tts_tpu.training`` — train the DiT from a manifest."""

from __future__ import annotations

import argparse

from ..config import ModelConfig
from .loop import TrainRunConfig, train
from .train import TrainConfig


def main() -> None:
    ap = argparse.ArgumentParser(prog="vietvoice-tts-train")
    ap.add_argument("--manifest", default=None, help="JSON-lines {audio, text} manifest")
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--learning-rate", type=float, default=1e-4)
    ap.add_argument("--checkpoint-dir", default="checkpoints/dit")
    ap.add_argument("--model-cache-dir", default=None)
    ap.add_argument("--mesh-data", type=int, default=1)
    ap.add_argument("--mesh-model", type=int, default=1)
    args = ap.parse_args()

    kwargs = dict(mesh_data_axis=args.mesh_data, mesh_model_axis=args.mesh_model)
    if args.model_cache_dir:
        kwargs["model_cache_dir"] = args.model_cache_dir
    summary = train(
        model_config=ModelConfig(**kwargs),
        train_config=TrainConfig(learning_rate=args.learning_rate),
        run_config=TrainRunConfig(
            steps=args.steps,
            batch_size=args.batch_size,
            checkpoint_dir=args.checkpoint_dir,
        ),
        manifest_path=args.manifest,
    )
    print(summary)


if __name__ == "__main__":
    main()
