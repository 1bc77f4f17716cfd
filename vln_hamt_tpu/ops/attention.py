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


def _splitmix32(x: jnp.ndarray) -> jnp.ndarray:
    """Stateless 32-bit finalizer (splitmix/murmur3 style avalanche).

    Counter-based RNG for in-kernel dropout: unlike ``pltpu.prng_*`` it
    lowers on every backend (TPU hardware AND interpret mode), and being
    a pure function of (seed, position) it is bit-identical between the
    rollout and replay programs — which is what RL replay parity needs.
    """
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _attn_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                 scale, dropout_rate):
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

    if dropout_rate > 0.0:
        lq, lk = p.shape
        i = pl.program_id(0).astype(jnp.uint32)  # batch
        j = pl.program_id(1).astype(jnp.uint32)  # head
        row = jax.lax.broadcasted_iota(jnp.uint32, (lq, lk), 0)
        col = jax.lax.broadcasted_iota(jnp.uint32, (lq, lk), 1)
        idx = row * jnp.uint32(lk) + col
        key = (seed_ref[0].astype(jnp.uint32)
               + i * jnp.uint32(0x9E3779B1)
               + j * jnp.uint32(0x85EBCA77))
        bits = _splitmix32(key ^ _splitmix32(idx))
        thresh = jnp.uint32(min(int(dropout_rate * 4294967296.0), 4294967295))
        keep = bits >= thresh
        p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)

    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, dm_ref, *, scale, dropout_rate):
    """Fused backward for one (batch, head) block.

    Recomputes the probability matrix in VMEM (flash-style — cheaper
    than spilling (B,H,Lq,Lk) fp32 to HBM at these sizes) then applies
    the softmax/dropout VJP and the three matmul gradients in one pass.
    ``dm_ref`` (the additive-mask cotangent, broadcast over heads and
    query rows in the forward) is accumulated across the head grid
    steps, which revisit the same (B,1,Lk) output block.
    """
    q = q_ref[0].astype(jnp.float32)  # (Lq, Dh)
    k = k_ref[0].astype(jnp.float32)  # (Lk, Dh)
    v = v_ref[0].astype(jnp.float32)
    m = mask_ref[0].astype(jnp.float32)  # (1, Lk)
    g = g_ref[0].astype(jnp.float32)  # (Lq, Dh)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + m
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # bit-identical to fwd

    # dv = p_dropped^T g ; dp = (g v^T) through the dropout mask
    dpd = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Lq, Lk)
    if dropout_rate > 0.0:
        lq, lk = p.shape
        i = pl.program_id(0).astype(jnp.uint32)
        j = pl.program_id(1).astype(jnp.uint32)
        row = jax.lax.broadcasted_iota(jnp.uint32, (lq, lk), 0)
        col = jax.lax.broadcasted_iota(jnp.uint32, (lq, lk), 1)
        idx = row * jnp.uint32(lk) + col
        key = (seed_ref[0].astype(jnp.uint32)
               + i * jnp.uint32(0x9E3779B1)
               + j * jnp.uint32(0x85EBCA77))
        bits = _splitmix32(key ^ _splitmix32(idx))
        thresh = jnp.uint32(min(int(dropout_rate * 4294967296.0), 4294967295))
        keep = bits >= thresh
        inv = 1.0 / (1.0 - dropout_rate)
        pd = jnp.where(keep, p * inv, 0.0)
        dp = jnp.where(keep, dpd * inv, 0.0)
    else:
        pd = p
        dp = dpd

    dv = jax.lax.dot_general(
        pd, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Lk, Dh)
    # softmax VJP: ds = p * (dp - rowsum(dp * p))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dm_row = jnp.sum(ds, axis=0, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dm_ref[0] = dm_row.astype(dm_ref.dtype)

    @pl.when(pl.program_id(1) != 0)
    def _():
        dm_ref[0] = dm_ref[0] + dm_row.astype(dm_ref.dtype)


def _dropout_keep_mask(seed: jnp.ndarray, b: int, h: int, lq: int, lk: int,
                       rate: float) -> jnp.ndarray:
    """(B, H, Lq, Lk) keep mask, bit-identical to the in-kernel hash.

    Used by the custom-VJP backward to recompute the exact dropout
    pattern the forward kernel applied.
    """
    i = jnp.arange(b, dtype=jnp.uint32)[:, None, None, None]
    j = jnp.arange(h, dtype=jnp.uint32)[None, :, None, None]
    row = jnp.arange(lq, dtype=jnp.uint32)[None, None, :, None]
    col = jnp.arange(lk, dtype=jnp.uint32)[None, None, None, :]
    idx = row * jnp.uint32(lk) + col
    key = (seed.reshape(()).astype(jnp.uint32)
           + i * jnp.uint32(0x9E3779B1)
           + j * jnp.uint32(0x85EBCA77))
    bits = _splitmix32(key ^ _splitmix32(idx))
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return bits >= thresh


def _attention_reference(q, k, v, additive_mask, seed, rate: float):
    """Plain-XLA forward with the same math (fp32, same dropout bits).

    Oracle for the kernel tests; the production backward is the fused
    ``_attn_bwd_kernel`` (pallas), which must match jax.grad of this.
    """
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / (dh ** 0.5)
    scores = scores + additive_mask[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(scores, axis=-1)
    if rate > 0.0:
        keep = _dropout_keep_mask(seed, b, h, lq, lk, rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_attention_core(rate: float, interpret: bool, seed, q, k, v,
                          additive_mask):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = 1.0 / (dh ** 0.5)
    on_tpu = _HAS_PLTPU and not interpret
    grid = (b, h)
    bspec = lambda l: pl.BlockSpec(
        (1, l, dh), lambda i, j: (i * h + j, 0, 0),
        **({"memory_space": pltpu.VMEM} if on_tpu else {}),
    )
    mspec = pl.BlockSpec(
        (1, 1, lk), lambda i, j: (i, 0, 0),
        **({"memory_space": pltpu.VMEM} if on_tpu else {}),
    )
    sspec = pl.BlockSpec(
        (1,), lambda i, j: (0,),
        **({"memory_space": pltpu.SMEM} if on_tpu else {}),
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, dropout_rate=rate),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, dh), jnp.float32),
        grid=grid,
        in_specs=[sspec, bspec(lq), bspec(lk), bspec(lk), mspec],
        out_specs=bspec(lq),
        interpret=interpret,
    )(
        seed.reshape(1).astype(jnp.int32),
        q.reshape(b * h, lq, dh),
        k.reshape(b * h, lk, dh),
        v.reshape(b * h, lk, dh),
        additive_mask.reshape(b, 1, lk),
    )
    return out.reshape(b, h, lq, dh)


def _core_fwd(rate, interpret, seed, q, k, v, additive_mask):
    out = _fused_attention_core(rate, interpret, seed, q, k, v, additive_mask)
    return out, (seed, q, k, v, additive_mask)


def _core_bwd(rate, interpret, res, g):
    import numpy as np

    seed, q, k, v, additive_mask = res
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = 1.0 / (dh ** 0.5)
    on_tpu = _HAS_PLTPU and not interpret
    bspec = lambda l: pl.BlockSpec(
        (1, l, dh), lambda i, j: (i * h + j, 0, 0),
        **({"memory_space": pltpu.VMEM} if on_tpu else {}),
    )
    mspec = pl.BlockSpec(
        (1, 1, lk), lambda i, j: (i, 0, 0),
        **({"memory_space": pltpu.VMEM} if on_tpu else {}),
    )
    sspec = pl.BlockSpec(
        (1,), lambda i, j: (0,),
        **({"memory_space": pltpu.SMEM} if on_tpu else {}),
    )
    dq, dk, dv, dm = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, dropout_rate=rate),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, lq, dh), q.dtype),
            jax.ShapeDtypeStruct((b * h, lk, dh), k.dtype),
            jax.ShapeDtypeStruct((b * h, lk, dh), v.dtype),
            # dm accumulates ACROSS the head grid steps — keep the
            # running sum in fp32 even for a bf16 mask (cast at the end)
            jax.ShapeDtypeStruct((b, 1, lk), jnp.float32),
        ),
        grid=(b, h),
        in_specs=[sspec, bspec(lq), bspec(lk), bspec(lk), mspec, bspec(lq)],
        out_specs=(bspec(lq), bspec(lk), bspec(lk), mspec),
        interpret=interpret,
    )(
        seed.reshape(1).astype(jnp.int32),
        q.reshape(b * h, lq, dh),
        k.reshape(b * h, lk, dh),
        v.reshape(b * h, lk, dh),
        additive_mask.reshape(b, 1, lk),
        g.astype(jnp.float32).reshape(b * h, lq, dh),
    )
    ct_seed = np.zeros(seed.shape, jax.dtypes.float0)
    return (ct_seed, dq.reshape(b, h, lq, dh), dk.reshape(b, h, lk, dh),
            dv.reshape(b, h, lk, dh),
            dm.reshape(additive_mask.shape).astype(additive_mask.dtype))


_fused_attention_core.defvjp(_core_fwd, _core_bwd)


def fused_attention(
    q: jnp.ndarray,  # (B, H, Lq, Dh)
    k: jnp.ndarray,  # (B, H, Lk, Dh)
    v: jnp.ndarray,  # (B, H, Lk, Dh)
    additive_mask: jnp.ndarray,  # (B, Lk) additive (0 keep / -1e4 drop)
    interpret: bool | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jnp.ndarray | None = None,  # (1,) int32/uint32
) -> jnp.ndarray:
    """Returns (B, H, Lq, Dh) float32.

    With ``dropout_rate > 0`` the kernel applies attention-prob dropout
    in-register (counter-based hash of (seed, batch, head, position)),
    so the fused path stays usable for training; ``dropout_seed`` must
    then be provided and varies per call/step. Differentiable: the
    custom-VJP backward is a second fused pallas kernel that recomputes
    the probability matrix in VMEM (identical dropout bits) and emits
    dq/dk/dv/dmask in one pass.
    """
    if interpret is None:
        interpret = not pallas_available()
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)
    return _fused_attention_core(float(dropout_rate), bool(interpret),
                                 dropout_seed, q, k, v, additive_mask)
