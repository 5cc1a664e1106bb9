"""CFG-cache sampler acceleration (``SamplerConfig.uncond_interval``).

The opt-in beyond-reference feature: refresh the unconditional CFG branch
only every k-th velocity eval and reuse the cached uncond velocity in
between. interval=1 must be the exact reference semantics; with
cfg_strength=0 the cached branch is unused, so every interval must produce
bit-identical output — that pins the segment/padding bookkeeping (31 evals
do not divide evenly by k) independently of the approximation itself.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vietvoice_tts_tpu.models.dit import DiTConfig, init_dit_params
from vietvoice_tts_tpu.models.sampler import SamplerConfig, flow_matching_sample

DIT = DiTConfig(
    dim=64,
    depth=2,
    heads=4,
    ff_mult=2,
    n_mels=16,
    text_dim=32,
    text_conv_layers=1,
    vocab_size=32,
    compute_dtype=jnp.float32,
)


def _sample(scfg: SamplerConfig, params, b=2, n=64, seed=0):
    rng = np.random.default_rng(seed)
    cond = rng.standard_normal((b, n, DIT.n_mels)).astype(np.float32) * 0.1
    text = np.full((b, n), 3, np.int32)
    text[:, n // 2 :] = -1
    mask = np.ones((b, n), bool)
    mask[1, n - 8 :] = False
    seeds = np.arange(b, dtype=np.uint32)
    return np.asarray(
        flow_matching_sample(
            params, DIT, scfg, jax.random.PRNGKey(0),
            jnp.asarray(cond), jnp.asarray(text), jnp.asarray(mask),
            jnp.asarray(seeds),
        )
    )


class TestCfgCache:
    def test_interval_exact_when_cfg_strength_zero(self):
        """cfg_strength=0 makes the uncond branch a no-op: every interval
        (including ones that need dt=0 padding — 7 evals, k∈{2,3}) must
        reproduce the exact sampler bit-for-bit."""
        params = init_dit_params(0, DIT)
        base = SamplerConfig(nfe_step=8, cfg_strength=0.0)
        ref = _sample(base, params)
        for k in (2, 3, 4):
            out = _sample(dataclasses.replace(base, uncond_interval=k), params)
            np.testing.assert_allclose(out, ref, atol=1e-6, err_msg=f"k={k}")

    def test_interval_two_is_close_but_not_identical(self):
        """With real guidance the cached-uncond path approximates the exact
        solve: outputs must stay finite and in the same range, and must
        differ (if they were identical the cache would not be wired)."""
        params = init_dit_params(0, DIT)
        base = SamplerConfig(nfe_step=8, cfg_strength=2.0)
        ref = _sample(base, params)
        out = _sample(dataclasses.replace(base, uncond_interval=2), params)
        assert np.isfinite(out).all()
        assert out.shape == ref.shape
        assert not np.array_equal(out, ref)
        # Same masked-region zeroing behavior as the exact path.
        assert np.abs(out).max() < 10 * max(np.abs(ref).max(), 1.0)

    def test_interval_one_is_default_path(self):
        """uncond_interval=1 must be byte-identical to the default config
        (the segmented code path must not engage)."""
        params = init_dit_params(0, DIT)
        ref = _sample(SamplerConfig(nfe_step=6, cfg_strength=2.0), params)
        out = _sample(
            SamplerConfig(nfe_step=6, cfg_strength=2.0, uncond_interval=1), params
        )
        np.testing.assert_array_equal(out, ref)

    def test_engine_core_plumbs_interval(self, tiny_pack_dir):
        """ModelConfig.nfe_uncond_interval reaches the EngineCore sampler
        config and the full synthesis path runs with it."""
        from vietvoice_tts_tpu.client import TTSApi

        from conftest import tiny_config

        cfg = tiny_config(
            model_cache_dir=str(tiny_pack_dir), nfe_uncond_interval=2
        )
        with TTSApi(cfg) as api:
            assert api.engine.engine_core.sampler_cfg.uncond_interval == 2
            wave, _ = api.synthesize("Xin chào")
            assert wave.dtype == np.int16 and len(wave) > 0
