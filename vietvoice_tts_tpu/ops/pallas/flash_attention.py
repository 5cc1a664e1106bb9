"""Fused attention kernel for the DiT denoiser (Pallas/TPU).

Replaces what the reference hides inside ``transformer.onnx`` (SURVEY §2).
Design for this workload: DiT sequence lengths are mel-frame buckets
≤ 2048 and head_dim is 64, so per (batch, head) the whole K/V (≤ 2048x64)
fits comfortably in VMEM. The kernel therefore blocks only over queries:
each grid cell computes an exact softmax over the full key axis —
logits [BLK_Q, N] live only in VMEM/registers, never in HBM (the memory
win of flash attention without the online-softmax bookkeeping, which
would buy nothing at N ≤ 2048).

Padding is handled with an additive f32 bias row precomputed from the
frame-validity mask. All softmax math is f32; Q·K and P·V hit the MXU in
the input dtype with f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # [BLK_Q, D]
    k = k_ref[0, 0]  # [N, D]
    v = v_ref[0, 0]  # [N, D]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLK_Q, N]
    s = s * scale + bias_ref[0]  # bias block [1, N] broadcasts over queries
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def flash_attention(
    q: jnp.ndarray,  # [B, H, N, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,  # [B, N] bool, True = valid
    block_q: int = 256,
) -> jnp.ndarray:
    b, h, n, d = q.shape
    block_q = min(block_q, n)
    if n % block_q != 0:
        raise ValueError(f"sequence length {n} not divisible by block_q {block_q}")
    if mask is None:
        bias = jnp.zeros((b, 1, n), jnp.float32)
    else:
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    grid = (b, h, n // block_q)
    kernel = functools.partial(_attn_kernel, scale=d**-0.5)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, n, d), lambda bi, hi, qi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n, d), lambda bi, hi, qi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d),
            lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=(2 * b * h * n * d + b * h * n * d) * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(q, k, v, bias)
