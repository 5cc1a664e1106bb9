"""Minimal sharded training loop for the flow-matching DiT.

Demonstrates mesh setup, TP/DP shardings, the train step, and Orbax
checkpointing. Replace `synthetic_batches` with a real (mel, text, lengths)
dataset; mel extraction for a corpus can reuse `ops.stft.MelFrontend`.
Run small on CPU: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/train_dit.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from vietvoice_tts_tpu.models.dit import DiTConfig, init_dit_params
from vietvoice_tts_tpu.models.vocoder import VocoderConfig, init_vocoder_params
from vietvoice_tts_tpu.parallel.mesh import make_mesh
from vietvoice_tts_tpu.parallel.sharding import batch_sharding, shard_params
from vietvoice_tts_tpu.training.checkpoint import CheckpointManager
from vietvoice_tts_tpu.training.train import TrainConfig, init_train_state, make_train_step

if os_env := __import__("os").environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os_env)

DIT = DiTConfig(dim=256, depth=4, heads=8, n_mels=100, text_dim=128,
                text_conv_layers=2, vocab_size=211, compute_dtype=jnp.float32)
VOC = VocoderConfig(n_mels=100)
TRAIN = TrainConfig(learning_rate=3e-4, warmup_steps=100)

n_dev = len(jax.devices())
tp = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
mesh = make_mesh(model=tp)
print(f"mesh: {dict(mesh.shape)}")


def synthetic_batches(batch, n_frames, steps):
    rng = np.random.default_rng(0)
    for _ in range(steps):
        yield (
            rng.standard_normal((batch, n_frames, DIT.n_mels)).astype(np.float32),
            rng.integers(0, DIT.vocab_size, (batch, n_frames)).astype(np.int32),
            np.full((batch,), n_frames, np.int32),
        )


with mesh:
    params = shard_params(
        {"dit": init_dit_params(0, DIT), "vocoder": init_vocoder_params(1, VOC)},
        mesh, DIT, VOC,
    )["dit"]
    opt_state = init_train_state(params, TRAIN)
    step_fn = jax.jit(make_train_step(DIT, TRAIN))
    ckpt = CheckpointManager("checkpoints/dit", save_interval_steps=50)

    key = jax.random.PRNGKey(0)
    for step, (mel, text, lengths) in enumerate(synthetic_batches(8, 256, 200)):
        mel, text, lengths = (
            jax.device_put(a, batch_sharding(mesh, a.ndim)) for a in (mel, text, lengths)
        )
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_fn(params, opt_state, sub, mel, text, lengths)
        if step % 20 == 0:
            print(f"step {step}: loss {float(loss):.4f}")
        ckpt.save(step, params, opt_state)
    ckpt.manager.wait_until_finished()
    print("final checkpoint at step", ckpt.latest_step())
