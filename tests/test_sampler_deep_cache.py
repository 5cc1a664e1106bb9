"""Deep-block-cache sampler acceleration (``SamplerConfig.deep_cache_*``).

Training-free NFE acceleration (TeaCache/Δ-DiT family, ROADMAP
beyond-parity item): every r-th velocity eval runs the full DiT depth and
records the deep trunk's residual contribution; the evals in between run
only the first j blocks and reuse it. interval=1 must be the exact
reference semantics. When the DEEP blocks are exact identities (their
AdaLN-Zero gates are zero), the cached contribution is exactly zero — so
every (r, j) must reproduce the exact solve bit-for-bit, which pins the
segment/padding bookkeeping independently of the approximation itself.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietvoice_tts_tpu.models.dit import DiTConfig, init_dit_params
from vietvoice_tts_tpu.models.sampler import SamplerConfig, flow_matching_sample

DIT = DiTConfig(
    dim=64,
    depth=4,
    heads=4,
    ff_mult=2,
    n_mels=16,
    text_dim=32,
    text_conv_layers=1,
    vocab_size=32,
    compute_dtype=jnp.float32,
)


def _params(seed=0, live_blocks=None):
    """Init params with the AdaLN gates opened (random) on ``live_blocks``
    (None = all). AdaLN-Zero init makes every block an identity, which
    would also make the deep cache trivially exact — tests that want real
    deep contributions must open the gates."""
    params = init_dit_params(seed, DIT)
    rng = np.random.default_rng(seed + 100)
    w = rng.normal(0.0, 0.05, params["blocks"]["ada"]["w"].shape).astype(np.float32)
    b = rng.normal(0.0, 0.05, params["blocks"]["ada"]["b"].shape).astype(np.float32)
    if live_blocks is not None:
        keep = np.zeros(DIT.depth, bool)
        keep[list(live_blocks)] = True
        w[~keep] = 0.0
        b[~keep] = 0.0
    params["blocks"]["ada"]["w"] = w
    params["blocks"]["ada"]["b"] = b
    return params


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


class TestDeepCache:
    def test_exact_when_deep_blocks_are_identity(self):
        """Gates open only on the first j blocks ⇒ the deep trunk
        contributes exactly zero ⇒ the cached path must be bit-identical
        for every interval, including ones needing dt=0 padding (7 evals,
        r∈{2,3})."""
        j = 2
        params = _params(live_blocks=range(j))
        base = SamplerConfig(nfe_step=8, cfg_strength=2.0)
        ref = _sample(base, params)
        for r in (2, 3, 4):
            out = _sample(
                dataclasses.replace(
                    base, deep_cache_interval=r, deep_cache_blocks=j
                ),
                params,
            )
            np.testing.assert_allclose(out, ref, atol=1e-6, err_msg=f"r={r}")

    def test_interval_two_is_close_but_not_identical(self):
        """With live deep blocks the cached path approximates the exact
        solve: finite, same range, but not identical (else the cache is
        not wired)."""
        params = _params()
        base = SamplerConfig(nfe_step=8, cfg_strength=2.0)
        ref = _sample(base, params)
        out = _sample(
            dataclasses.replace(
                base, deep_cache_interval=2, deep_cache_blocks=2
            ),
            params,
        )
        assert np.isfinite(out).all()
        assert out.shape == ref.shape
        assert not np.array_equal(out, ref)
        assert np.abs(out).max() < 10 * max(np.abs(ref).max(), 1.0)

    def test_interval_one_is_default_path(self):
        params = _params()
        ref = _sample(SamplerConfig(nfe_step=6, cfg_strength=2.0), params)
        out = _sample(
            SamplerConfig(
                nfe_step=6, cfg_strength=2.0,
                deep_cache_interval=1, deep_cache_blocks=2,
            ),
            params,
        )
        np.testing.assert_array_equal(out, ref)

    def test_mutually_exclusive_with_cfg_cache(self):
        params = _params()
        scfg = SamplerConfig(
            nfe_step=8, uncond_interval=2, deep_cache_interval=2,
            deep_cache_blocks=2,
        )
        with pytest.raises(ValueError, match="mutually exclusive"):
            _sample(scfg, params)

    def test_config_validation(self):
        from vietvoice_tts_tpu.config import ModelConfig

        with pytest.raises(ValueError, match="mutually exclusive"):
            ModelConfig(nfe_uncond_interval=2, nfe_deep_cache_interval=2)
        with pytest.raises(ValueError, match="nfe_deep_cache_blocks"):
            ModelConfig(
                dit_depth=4, nfe_deep_cache_interval=2, nfe_deep_cache_blocks=9
            )
        # Off by default, and tiny depths stay constructible with the
        # full-size default blocks value.
        cfg = ModelConfig(dit_depth=2)
        assert cfg.nfe_deep_cache_interval == 1

    def test_engine_core_plumbs_deep_cache(self, tiny_pack_dir):
        from vietvoice_tts_tpu.client import TTSApi

        from conftest import tiny_config

        cfg = tiny_config(
            model_cache_dir=str(tiny_pack_dir),
            nfe_deep_cache_interval=2,
            nfe_deep_cache_blocks=1,
        )
        with TTSApi(cfg) as api:
            core = api.engine.engine_core
            assert core.sampler_cfg.deep_cache_interval == 2
            assert core.sampler_cfg.deep_cache_blocks == 1
            wave, _ = api.synthesize("Xin chào")
            assert wave.dtype == np.int16 and len(wave) > 0
