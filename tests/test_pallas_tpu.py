"""Pallas kernel correctness vs XLA twins — requires a real TPU.

The main test suite forces CPU (conftest.py), so these skip there; run them
directly on TPU hardware with:

    python -m pytest tests/test_pallas_tpu.py --no-header -q -p no:cacheprovider \
        --override-ini= -k pallas  # (plain `pytest tests/test_pallas_tpu.py` works too)

    JAX_REQUIRE_TPU=1 python tests/test_pallas_tpu.py   # standalone runner
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas kernels require TPU"
)

import jax.numpy as jnp


def _data(B=2, N=512, H=8, D=128, seed=0):
    rng = np.random.default_rng(seed)
    qkv = rng.standard_normal((B, N, 3 * H * D)).astype(np.float32)
    mask = np.arange(N)[None, :] < np.array([N - 100, N])[:B, None]
    return qkv, mask


class TestFlashAttention:
    def test_matches_xla(self):
        from vietvoice_tts_tpu.ops.attention import attention
        from vietvoice_tts_tpu.ops.pallas.flash_attention import flash_attention

        rng = np.random.default_rng(0)
        q, k, v = (
            jnp.asarray(rng.standard_normal((2, 4, 512, 64)).astype(np.float32))
            for _ in range(3)
        )
        mask = jnp.asarray(np.arange(512)[None, :] < np.array([300, 512])[:, None])
        ref = np.asarray(attention(q, k, v, mask, use_pallas=False))
        out = np.asarray(flash_attention(q, k, v, mask))
        assert np.abs(out - ref)[:, :, :300].max() < 5e-3


class TestFusedQkvRopeAttention:
    def test_matches_reference_path(self):
        from vietvoice_tts_tpu.ops.attention import attention
        from vietvoice_tts_tpu.ops.pallas.fused_rope_attention import (
            fused_qkv_rope_attention,
        )
        from vietvoice_tts_tpu.ops.rope import apply_rope, rope_tables

        B, N, H, D = 2, 512, 8, 128
        qkv, mask = _data(B, N, H, D)
        cos, sin = rope_tables(N, D)
        out = np.asarray(
            fused_qkv_rope_attention(
                jnp.asarray(qkv), jnp.asarray(cos), jnp.asarray(sin),
                jnp.asarray(mask), heads=H,
            )
        )
        r = qkv.reshape(B, N, 3, H, D)
        q = jnp.moveaxis(jnp.asarray(r[:, :, 0]), 1, 2)
        k = jnp.moveaxis(jnp.asarray(r[:, :, 1]), 1, 2)
        v = jnp.moveaxis(jnp.asarray(r[:, :, 2]), 1, 2)
        ref = np.moveaxis(
            np.asarray(
                attention(
                    apply_rope(q, cos, sin), apply_rope(k, cos, sin), v,
                    jnp.asarray(mask), use_pallas=False,
                )
            ),
            1,
            2,
        ).reshape(B, N, H * D)
        assert np.abs(out - ref)[:, : N - 100].max() < 5e-3

    def test_head_pair_path_f5_shape(self):
        """The converted-F5 attention shape: 16 heads × head_dim 64.

        Exercises the head-PAIR grid (128-wide column blocks, two 64-lane
        pipelines per cell) on real Mosaic lowering."""
        from vietvoice_tts_tpu.ops.attention import attention
        from vietvoice_tts_tpu.ops.pallas.fused_rope_attention import (
            fused_qkv_rope_attention,
        )
        from vietvoice_tts_tpu.ops.rope import apply_rope, rope_tables

        B, N, H, D = 2, 512, 16, 64
        qkv, mask = _data(B, N, H, D)
        cos, sin = rope_tables(N, D)
        out = np.asarray(
            fused_qkv_rope_attention(
                jnp.asarray(qkv), jnp.asarray(cos), jnp.asarray(sin),
                jnp.asarray(mask), heads=H,
            )
        )
        r = qkv.reshape(B, N, 3, H, D)
        q = jnp.moveaxis(jnp.asarray(r[:, :, 0]), 1, 2)
        k = jnp.moveaxis(jnp.asarray(r[:, :, 1]), 1, 2)
        v = jnp.moveaxis(jnp.asarray(r[:, :, 2]), 1, 2)
        ref = np.moveaxis(
            np.asarray(
                attention(
                    apply_rope(q, cos, sin), apply_rope(k, cos, sin), v,
                    jnp.asarray(mask), use_pallas=False,
                )
            ),
            1,
            2,
        ).reshape(B, N, H * D)
        assert np.abs(out - ref)[:, : N - 100].max() < 5e-3


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
