"""Self-attention for the DiT denoiser.

The reference hides attention inside ``transformer.onnx``; here it is explicit
so that (a) XLA can fuse QKV projections and softmax, (b) the Pallas flash
kernel (``ops/pallas/flash_attention.py``) can replace the quadratic
reference implementation on TPU, and (c) heads can be sharded over the
``model`` mesh axis. All softmax math accumulates in f32 regardless of the
bf16 compute dtype (BASELINE numerics gate: mel atol 1e-2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Bidirectional multi-head attention.

    q, k, v: [B, H, N, D]; mask: [B, N] bool (True = valid frame) or None.
    Returns [B, H, N, D] in q's dtype.
    """
    if use_pallas:
        try:
            from .pallas.flash_attention import flash_attention

            return flash_attention(q, k, v, mask)
        except Exception:  # pragma: no cover — fall back off-TPU
            pass
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        bias = jnp.where(mask[:, None, None, :], 0.0, NEG_INF)
        logits = logits + bias
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32).astype(q.dtype)
