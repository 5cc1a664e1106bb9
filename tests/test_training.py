"""Training tests: loss sanity, gradient flow, train-step progress."""

import jax
import jax.numpy as jnp
import numpy as np

from vietvoice_tts_tpu.models.dit import DiTConfig, init_dit_params
from vietvoice_tts_tpu.training.train import (
    TrainConfig,
    flow_matching_loss,
    init_train_state,
    make_train_step,
)

CFG = DiTConfig(
    dim=64,
    depth=2,
    heads=4,
    ff_mult=2,
    n_mels=16,
    text_dim=32,
    text_conv_layers=1,
    vocab_size=32,
    compute_dtype=jnp.float32,
    use_pallas=False,
)
TRAIN = TrainConfig(warmup_steps=2)


def _batch(b=2, n=64):
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((b, n, CFG.n_mels)).astype(np.float32)
    text = np.full((b, n), 3, np.int32)
    lengths = np.array([n, n // 2], np.int32)[:b]
    return jnp.asarray(mel), jnp.asarray(text), jnp.asarray(lengths)


class TestLoss:
    def test_finite_positive(self):
        params = init_dit_params(0, CFG)
        mel, text, lengths = _batch()
        loss = flow_matching_loss(
            params, CFG, jax.random.PRNGKey(0), mel, text, lengths, TRAIN
        )
        assert np.isfinite(float(loss))
        assert float(loss) > 0

    def test_gradients_flow(self):
        params = init_dit_params(0, CFG)
        mel, text, lengths = _batch()
        grads = jax.grad(flow_matching_loss)(
            params, CFG, jax.random.PRNGKey(0), mel, text, lengths, TRAIN
        )
        # At init the AdaLN-Zero gates are 0, so block internals (qkv/ff)
        # legitimately receive zero gradient; the path into and out of the
        # trunk, and the gate projections themselves, must not be dead.
        assert float(jnp.abs(grads["final_proj"]["w"]).max()) > 0
        assert float(jnp.abs(grads["input_proj"]["w"]).max()) > 0
        assert float(jnp.abs(grads["text_embed"]["table"]).max()) > 0
        assert float(jnp.abs(grads["blocks"]["ada"]["w"]).max()) > 0

    def test_gradients_reach_qkv_after_gates_open(self):
        """Once the gates move off zero, attention weights train."""
        params = init_dit_params(0, CFG)
        opt_state = init_train_state(params, TRAIN)
        step = jax.jit(make_train_step(CFG, TRAIN))
        mel, text, lengths = _batch()
        for i in range(3):
            params, opt_state, _ = step(
                params, opt_state, jax.random.PRNGKey(i), mel, text, lengths
            )
        grads = jax.grad(flow_matching_loss)(
            params, CFG, jax.random.PRNGKey(9), mel, text, lengths, TRAIN
        )
        assert float(jnp.abs(grads["blocks"]["qkv"]["w"]).max()) > 0

    def test_key_changes_loss(self):
        params = init_dit_params(0, CFG)
        mel, text, lengths = _batch()
        l1 = flow_matching_loss(
            params, CFG, jax.random.PRNGKey(1), mel, text, lengths, TRAIN
        )
        l2 = flow_matching_loss(
            params, CFG, jax.random.PRNGKey(2), mel, text, lengths, TRAIN
        )
        assert float(l1) != float(l2)


class TestTrainStep:
    def test_loss_decreases_on_repeated_batch(self):
        params = init_dit_params(0, CFG)
        opt_state = init_train_state(params, TRAIN)
        step = jax.jit(make_train_step(CFG, TRAIN))
        mel, text, lengths = _batch()
        losses = []
        for i in range(12):
            params, opt_state, loss = step(
                params, opt_state, jax.random.PRNGKey(0), mel, text, lengths
            )
            losses.append(float(loss))
        # Fixed key + fixed batch: pure optimization, loss must drop.
        assert losses[-1] < losses[0]

    def test_params_updated(self):
        params = init_dit_params(0, CFG)
        before = np.asarray(params["final_proj"]["w"]).copy()
        opt_state = init_train_state(params, TRAIN)
        step = jax.jit(make_train_step(CFG, TRAIN))
        mel, text, lengths = _batch()
        # Warmup lr is 0 at step 0; run a few steps so updates are nonzero.
        for i in range(3):
            params, opt_state, _ = step(
                params, opt_state, jax.random.PRNGKey(i), mel, text, lengths
            )
        after = np.asarray(params["final_proj"]["w"])
        assert not np.array_equal(before, after)
