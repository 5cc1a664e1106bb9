"""RoPE-fused attention directly on the packed QKV projection (Pallas/TPU).

HBM-traffic design (vs ``flash_attention.py``):

1. **Zero layout changes**: the kernel consumes the QKV projection output
   ``[B, N, 3·H·D]`` *as-is*. Per grid cell (batch b, head h, q-block i) the
   BlockSpec column-index selects the q block at column ``h·D``, K at
   ``(H+h)·D`` and V at ``(2H+h)·D`` — so the model performs no reshapes,
   no transposes, and the output ``[B, N, H·D]`` feeds the out-projection
   directly. (The [B,H,N,D] layout used by the generic kernel costs four
   ~32 MB moveaxis copies per DiT block at serving shapes.)
2. **RoPE fused**: rotary tables are applied inside the kernel, so rotated
   q/k never round-trip through HBM.
3. Same q-blocked exact-softmax core: K/V per (batch, head) resident in
   VMEM (≤ 2048×128), logits never materialized in HBM, f32 softmax, MXU
   dots with f32 accumulation.

Requires qkv packed as [q_heads ‖ k_heads ‖ v_heads] along the feature dim,
which is exactly how ``models/dit.py`` lays out its fused QKV weight.

Applicability: head_dim must be a 128 multiple (Mosaic lane tiling) and the
frame count an 8 multiple; ``models/dit.py`` falls back to the XLA path
otherwise. A converted F5 model (16 heads × head_dim 64) therefore runs the
XLA path today. If that ever shows up as the bottleneck, the extension is:
grid over head PAIRS with 128-wide (2·64) column blocks, split each block
into two 64-lane halves inside the kernel, and run two dot/softmax/PV
pipelines per cell — same total VPU work, MXU dots at half lane width
(exactly what XLA does for d=64, so the win stays the fused RoPE + zero
layout changes, not the MXU).

Roofline (measured at serving shapes, B=16 H=8 N=1024 D=128, v5e):
the kernel costs ~0.52 ms/call = ~11.5 ms per CFG-doubled DiT step (23% of
the step). The MXU dots are ~0.7 µs/cell; the cost is the exact-softmax VPU
work on the [BLK_Q, N] logits (~4 passes × B·H·N² elements ≈ 10.7 ms/step
theoretical) — i.e. the kernel sits AT the VPU floor for exact softmax.
bf16 exp was tried and is slower (Mosaic lowers it as convert→f32-exp→
convert); going below this floor requires windowed/sparse attention, which
changes model semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(qkv_q_ref, qkv_k_ref, qkv_v_ref, cos_q_ref, sin_q_ref,
            cos_k_ref, sin_k_ref, bias_ref, o_ref, *, scale: float):
    q = qkv_q_ref[0]  # [BLK_Q, D]
    k = qkv_k_ref[0]  # [N, D]
    v = qkv_v_ref[0]

    def rope(x, cos, sin):
        d = x.shape[-1]
        x1 = x[:, : d // 2]
        x2 = x[:, d // 2 :]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos.astype(x.dtype) + rotated * sin.astype(x.dtype)

    q = rope(q, cos_q_ref[:], sin_q_ref[:])
    k = rope(k, cos_k_ref[:], sin_k_ref[:])

    # Fold the softmax scale into q ([BLK_Q, D]) so no [BLK_Q, N]-sized
    # scale pass is needed — the VPU work on the logits matrix is the
    # kernel's bottleneck, not the MXU dots.
    q = q * jnp.asarray(scale, q.dtype)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLK_Q, N]
    s = s + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "block_q"))
def fused_qkv_rope_attention(
    qkv: jnp.ndarray,  # [B, N, 3·H·D] packed projection output
    cos: jnp.ndarray,  # [N, D] rope tables (f32 or compute dtype)
    sin: jnp.ndarray,
    mask: jnp.ndarray | None,  # [B, N] bool
    heads: int,
    block_q: int = 512,
) -> jnp.ndarray:
    """Multi-head RoPE attention → [B, N, H·D]."""
    b, n, three_hd = qkv.shape
    d = three_hd // (3 * heads)
    block_q = min(block_q, n)
    if n % block_q != 0:
        raise ValueError(f"sequence length {n} not divisible by block_q {block_q}")
    if mask is None:
        bias = jnp.zeros((b, 1, n), jnp.float32)
    else:
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    cos = cos.astype(qkv.dtype)
    sin = sin.astype(qkv.dtype)

    h = heads
    grid = (b, h, n // block_q)
    kernel = functools.partial(_kernel, scale=d**-0.5)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, h * d), qkv.dtype),
        grid=grid,
        in_specs=[
            # q block: rows [qi·BLK_Q, ...), cols head hi.
            pl.BlockSpec(
                (1, block_q, d), lambda bi, hi, qi: (bi, qi, hi),
                memory_space=pltpu.VMEM,
            ),
            # k: all rows, cols head H + hi.
            pl.BlockSpec(
                (1, n, d), lambda bi, hi, qi: (bi, 0, h + hi),
                memory_space=pltpu.VMEM,
            ),
            # v: all rows, cols head 2H + hi.
            pl.BlockSpec(
                (1, n, d), lambda bi, hi, qi: (bi, 0, 2 * h + hi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # cos rows for the q block
                (block_q, d), lambda bi, hi, qi: (qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_q, d), lambda bi, hi, qi: (qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(  # cos/sin full rows for keys
                (n, d), lambda bi, hi, qi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n, d), lambda bi, hi, qi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bi, hi, qi: (bi, qi, hi),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=(qkv.size + b * n * h * d) * qkv.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(qkv, qkv, qkv, cos, sin, cos, sin, bias)
