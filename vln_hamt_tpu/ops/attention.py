"""Fused masked attention (Pallas TPU kernel).

One kernel instance computes softmax(q k^T * scale + mask) v for a
single (batch, head) pair — HAMT's sequences are short (text <= 250,
[hist; obs] <= ~120 tokens), so a whole attention matrix fits VMEM in
one block and the win is fusing QK^T -> mask -> softmax -> V into one
VMEM-resident pass instead of three HBM round trips. For long sequences
this would become a flash-attention loop; at HAMT's sizes single-block
is the speed-of-light shape.

Wired into the transformer layers behind ``ModelConfig.
use_pallas_attention``; numerics are tested against the XLA path (CPU
uses interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def pallas_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)  # (Lq, Dh)
    k = k_ref[0].astype(jnp.float32)  # (Lk, Dh)
    v = v_ref[0].astype(jnp.float32)
    m = mask_ref[0].astype(jnp.float32)  # (1, Lk) additive

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + m  # (Lq, Lk)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def fused_attention(
    q: jnp.ndarray,  # (B, H, Lq, Dh)
    k: jnp.ndarray,  # (B, H, Lk, Dh)
    v: jnp.ndarray,  # (B, H, Lk, Dh)
    additive_mask: jnp.ndarray,  # (B, Lk) additive (0 keep / -1e4 drop)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns (B, H, Lq, Dh) float32."""
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = 1.0 / (dh ** 0.5)
    if interpret is None:
        interpret = not pallas_available()

    mask4 = additive_mask[:, None, None, :]  # (B, 1, 1, Lk)

    grid = (b, h)
    bspec = lambda l: pl.BlockSpec(
        (1, l, dh), lambda i, j: (i * h + j, 0, 0),
        **({"memory_space": pltpu.VMEM} if _HAS_PLTPU and not interpret else {}),
    )
    mspec = pl.BlockSpec(
        (1, 1, lk), lambda i, j: (i, 0, 0),
        **({"memory_space": pltpu.VMEM} if _HAS_PLTPU and not interpret else {}),
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, dh), jnp.float32),
        grid=grid,
        in_specs=[bspec(lq), bspec(lk), bspec(lk), mspec],
        out_specs=bspec(lq),
        interpret=interpret,
    )(
        q.reshape(b * h, lq, dh),
        k.reshape(b * h, lk, dh),
        v.reshape(b * h, lk, dh),
        additive_mask.reshape(b, 1, lk),
    )
    return out.reshape(b, h, lq, dh)
