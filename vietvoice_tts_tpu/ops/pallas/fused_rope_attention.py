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

Applicability: head_dim must be a 128 multiple (Mosaic lane tiling) OR 64
with an even head count, and the frame count an 8 multiple; ``models/dit.py``
falls back to the XLA path otherwise. The head_dim-64 case — what a
converted F5-family model (16 heads × 64) runs — grids over head PAIRS with
128-wide (2·64) column blocks, splits each block into two 64-lane halves
inside the kernel, and runs two dot/softmax/PV pipelines per cell: same
total VPU work, MXU dots at half lane width (exactly what XLA does for
d=64), so the win stays the fused RoPE + zero layout changes, not the MXU.
Measured (v5e, bf16, amortized inside a scan — single dispatches over the
tunneled link carry ~25 ms of launch latency that swamps kernel time):
16×64 @ B=16 N=1024 runs 1.71 ms/call vs 4.34 ms XLA (2.5×); at the
batch-1 latency shape (B=2 N=512) it is a wash (0.96×), so dispatching the
kernel everywhere it applies is safe. (8×128 @ B=16 N=1024: 1.08 ms vs
5.49 ms XLA, 5.1×.)

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


def _rope(x, cos, sin):
    d = x.shape[-1]
    x1 = x[:, : d // 2]
    x2 = x[:, d // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos.astype(x.dtype) + rotated * sin.astype(x.dtype)


def _attend(q, k, v, bias, out_dtype, scale):
    """One exact-softmax attention pipeline on a q block.

    q: [BLK_Q, d] (pre-RoPE'd), k/v: [N, d], bias: [BLK_Q-broadcastable, N].
    Folds the softmax scale into q so no [BLK_Q, N]-sized scale pass is
    needed — the VPU work on the logits matrix is the kernel's bottleneck,
    not the MXU dots."""
    q = q * jnp.asarray(scale, q.dtype)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLK_Q, N]
    s = s + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (o / l).astype(out_dtype)


def _kernel(qkv_q_ref, qkv_k_ref, qkv_v_ref, cos_q_ref, sin_q_ref,
            cos_k_ref, sin_k_ref, bias_ref, o_ref, *, scale: float):
    q = _rope(qkv_q_ref[0], cos_q_ref[:], sin_q_ref[:])  # [BLK_Q, D]
    k = _rope(qkv_k_ref[0], cos_k_ref[:], sin_k_ref[:])  # [N, D]
    o_ref[0] = _attend(q, k, qkv_v_ref[0], bias_ref[0], o_ref.dtype, scale)


def _kernel_pair(qkv_q_ref, qkv_k_ref, qkv_v_ref, cos_q_ref, sin_q_ref,
                 cos_k_ref, sin_k_ref, bias_ref, o_ref, *, scale: float,
                 d: int):
    """Head-PAIR variant for head_dim d=64: every ref carries a 2·d=128-wide
    column block holding two adjacent heads; run two attention pipelines on
    the 64-lane halves and write both back as one 128-wide block."""
    q2 = qkv_q_ref[0]  # [BLK_Q, 2d] heads (2hp, 2hp+1)
    k2 = qkv_k_ref[0]  # [N, 2d]
    v2 = qkv_v_ref[0]
    bias = bias_ref[0]
    halves = []
    for i in range(2):
        sl = slice(i * d, (i + 1) * d)
        q = _rope(q2[:, sl], cos_q_ref[:, sl], sin_q_ref[:, sl])
        k = _rope(k2[:, sl], cos_k_ref[:, sl], sin_k_ref[:, sl])
        halves.append(_attend(q, k, v2[:, sl], bias, o_ref.dtype, scale))
    o_ref[0] = jnp.concatenate(halves, axis=-1)


def supports_shape(heads: int, head_dim: int, n: int) -> bool:
    """True when the fused kernel has a code path for this attention shape."""
    if n % 8 != 0:
        return False
    return head_dim % 128 == 0 or (head_dim == 64 and heads % 2 == 0)


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "interpret"))
def fused_qkv_rope_attention(
    qkv: jnp.ndarray,  # [B, N, 3·H·D] packed projection output
    cos: jnp.ndarray,  # [N, D] rope tables (f32 or compute dtype)
    sin: jnp.ndarray,
    mask: jnp.ndarray | None,  # [B, N] bool
    heads: int,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head RoPE attention → [B, N, H·D]."""
    b, n, three_hd = qkv.shape
    d = three_hd // (3 * heads)
    # block_q must divide n; prefer the LARGEST dividing block ≤ block_q
    # that is a multiple of 8 (Mosaic sublane tiling) — bigger q blocks mean
    # fewer grid cells and larger MXU dots (the 704-frame bucket runs
    # 352-row blocks, 768 runs 384; naive halving would give 64 and 256).
    block_q = min(block_q, n)
    if n % block_q:
        block_q = next(
            (c for c in range(block_q - block_q % 8, 7, -8) if n % c == 0), 0
        )
    if not block_q:
        raise ValueError(f"sequence length {n} has no 8-multiple q-block size")
    if mask is None:
        bias = jnp.zeros((b, 1, n), jnp.float32)
    else:
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    cos = cos.astype(qkv.dtype)
    sin = sin.astype(qkv.dtype)

    h = heads
    if d % 128 == 0:
        # One head per grid cell; D is a whole number of 128-lane tiles.
        hb, n_hblocks = d, h
        k_base, v_base = h, 2 * h
        kernel = functools.partial(_kernel, scale=d**-0.5)
    elif d == 64 and h % 2 == 0:
        # Head pairs: 128-wide column blocks covering two adjacent heads.
        # Column block units are 2d wide, so the K section (starting at
        # column H·d) begins at block H/2, the V section at block H.
        hb, n_hblocks = 2 * d, h // 2
        k_base, v_base = h // 2, h
        kernel = functools.partial(_kernel_pair, scale=d**-0.5, d=d)
        cos = jnp.concatenate([cos, cos], axis=-1)  # [N, 2d]
        sin = jnp.concatenate([sin, sin], axis=-1)
    else:
        raise ValueError(
            f"fused attention kernel supports head_dim % 128 == 0 or "
            f"head_dim 64 with even heads; got heads={h} head_dim={d}"
        )

    grid = (b, n_hblocks, n // block_q)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, h * d), qkv.dtype),
        grid=grid,
        in_specs=[
            # q block: rows [qi·BLK_Q, ...), cols head-block hi.
            pl.BlockSpec(
                (1, block_q, hb), lambda bi, hi, qi: (bi, qi, hi),
                memory_space=pltpu.VMEM,
            ),
            # k: all rows, cols head-block k_base + hi.
            pl.BlockSpec(
                (1, n, hb), lambda bi, hi, qi: (bi, 0, k_base + hi),
                memory_space=pltpu.VMEM,
            ),
            # v: all rows, cols head-block v_base + hi.
            pl.BlockSpec(
                (1, n, hb), lambda bi, hi, qi: (bi, 0, v_base + hi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # cos rows for the q block
                (block_q, hb), lambda bi, hi, qi: (qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_q, hb), lambda bi, hi, qi: (qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(  # cos/sin full rows for keys
                (n, hb), lambda bi, hi, qi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n, hb), lambda bi, hi, qi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, hb), lambda bi, hi, qi: (bi, qi, hi),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=(qkv.size + b * n * h * d) * qkv.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, cos, sin, cos, sin, bias)
