"""Microbench: attention einsum/layout formulations on the real chip.

Targets the round-5 copy-floor attribution (BASELINE.md "Where the step
time actually goes"): 83% of the 190 ms/step `copy` category sits on
the attention einsums as bf16[128,{60,65},12,64]-scale relayouts
between token-major projections and (batch, head)-major batched dots
(107 ms backward / 50 ms forward), and 16% relayouts the attention-
dropout mask bits (u32[128,12,60,60]) between the RngBitGenerator and
the consumer dot fusion.

Two untried formulations are measured here against the production one
(models/layers.py:MultiHeadAttention), at the production shapes, fwd +
bwd, dropout on:

1. ``token_major`` — the production path: Dense -> reshape (B,L,H,D),
   ``einsum('bqhd,bkhd->bhqk')``. XLA canonicalizes the batched dots to
   (B,H)-leading operands and inserts layout copies.
2. ``head_major`` — QKV kernels viewed as (D,H,Dh) and contracted
   straight into head-major ``einsum('bqd,dhe->bhqe')``; every
   subsequent dot is (B,H)-batch-leading by construction; the output
   projection contracts (H,Dh) jointly (``'bhqe,heD->bqD'``). Same
   math, same parameters (a free reshape of the kernel) — if XLA can
   fold the layout change into the projection dots, the standalone
   copies disappear.
3. ``token_major_flatbits`` — production einsums, but the dropout mask
   bits are generated FLAT (n,) and reshaped, instead of directly in
   the (B,H,Q,K) mask shape, probing whether the RBG->consumer relayout
   is a shape/layout-assignment artifact.

Run on the real chip (defaults mirror the IL@128 rbg envelope):

    python scripts/bench_attn_layout.py            # rbg dropout
    RNG_IMPL=threefry2x32 python scripts/bench_attn_layout.py

Prints one JSON line per (variant, case) with ms/call for fwd and
fwd+bwd. Methodology: jitted value_and_grad, N async dispatches, one
trailing block_until_ready (the BASELINE.md pipelined-timing rule).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

B = int(os.environ.get("ATTN_B", 128))
LQ = int(os.environ.get("ATTN_LQ", 65))   # visual stream tokens
LK = int(os.environ.get("ATTN_LK", 60))   # text stream tokens
H, DH = 12, 64
D = H * DH
RATE = 0.1  # attention_probs_dropout_prob (configs/config.py)
STEPS = int(os.environ.get("ATTN_STEPS", 50))
DTYPE = jnp.bfloat16


def _params(key):
    ks = jax.random.split(key, 8)
    g = lambda k, shape: (jax.random.normal(k, shape, jnp.float32)
                          / jnp.sqrt(shape[0]))
    return {
        "wq": g(ks[0], (D, D)), "bq": jnp.zeros((D,), jnp.float32),
        "wk": g(ks[1], (D, D)), "bk": jnp.zeros((D,), jnp.float32),
        "wv": g(ks[2], (D, D)), "bv": jnp.zeros((D,), jnp.float32),
        "wo": g(ks[3], (D, D)), "bo": jnp.zeros((D,), jnp.float32),
    }


def _dropout(key, shape, rate, flat_bits=False):
    if flat_bits:
        n = 1
        for s in shape:
            n *= s
        keep = jax.random.bernoulli(key, 1.0 - rate, (n,)).reshape(shape)
    else:
        keep = jax.random.bernoulli(key, 1.0 - rate, shape)
    return keep


def attn_token_major(p, x, ctx, key, flat_bits=False):
    """The production formulation (models/layers.py:99-107)."""
    cast = lambda a: a.astype(DTYPE)
    q = (cast(x) @ cast(p["wq"]) + cast(p["bq"])).reshape(B, LQ, H, DH)
    k = (cast(ctx) @ cast(p["wk"]) + cast(p["bk"])).reshape(B, LK, H, DH)
    v = (cast(ctx) @ cast(p["wv"]) + cast(p["bv"])).reshape(B, LK, H, DH)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(DH).astype(DTYPE)
    probs = jax.nn.softmax(scores, axis=-1)
    keep = _dropout(key, probs.shape, RATE, flat_bits)
    probs = jnp.where(keep, probs / (1.0 - RATE), 0.0).astype(DTYPE)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, LQ, D)
    out = out @ cast(p["wo"]) + cast(p["bo"])
    return jnp.sum(out.astype(jnp.float32) ** 2)


def attn_head_major(p, x, ctx, key, flat_bits=False):
    """Head-major: the (B,L,HD)->(B,H,L,Dh) transpose rides inside the
    projection dots; every batched dot is (B,H)-leading by construction."""
    cast = lambda a: a.astype(DTYPE)
    wq = cast(p["wq"]).reshape(D, H, DH)
    wk = cast(p["wk"]).reshape(D, H, DH)
    wv = cast(p["wv"]).reshape(D, H, DH)
    bq = cast(p["bq"]).reshape(H, DH)[None, :, None, :]
    bk = cast(p["bk"]).reshape(H, DH)[None, :, None, :]
    bv = cast(p["bv"]).reshape(H, DH)[None, :, None, :]
    q = jnp.einsum("bqd,dhe->bhqe", cast(x), wq) + bq
    k = jnp.einsum("bkd,dhe->bhke", cast(ctx), wk) + bk
    v = jnp.einsum("bkd,dhe->bhke", cast(ctx), wv) + bv
    scores = jnp.einsum("bhqe,bhke->bhqk", q, k) / jnp.sqrt(DH).astype(DTYPE)
    probs = jax.nn.softmax(scores, axis=-1)
    keep = _dropout(key, probs.shape, RATE, flat_bits)
    probs = jnp.where(keep, probs / (1.0 - RATE), 0.0).astype(DTYPE)
    out = jnp.einsum("bhqk,bhke->bhqe", probs, v)
    wo = cast(p["wo"]).reshape(H, DH, D)
    out = jnp.einsum("bhqe,heD->bqD", out, wo) + cast(p["bo"])
    return jnp.sum(out.astype(jnp.float32) ** 2)


def measure(fn, p, x, ctx, key, grad: bool):
    if grad:
        f = jax.jit(jax.value_and_grad(fn))
    else:
        f = jax.jit(fn)
    out = f(p, x, ctx, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = f(p, x, ctx, key)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    rng_impl = os.environ.get("RNG_IMPL", "rbg")
    if rng_impl != "threefry2x32":
        jax.config.update("jax_default_prng_impl", rng_impl)
    key = jax.random.PRNGKey(0)
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, LQ, D), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, LK, D), jnp.float32)
    dkey = jax.random.PRNGKey(3)

    variants = {
        "token_major": functools.partial(attn_token_major, flat_bits=False),
        "head_major": functools.partial(attn_head_major, flat_bits=False),
        "token_major_flatbits": functools.partial(
            attn_token_major, flat_bits=True),
        "head_major_flatbits": functools.partial(
            attn_head_major, flat_bits=True),
    }
    # value parity first: same math modulo dot-order rounding
    ref = attn_token_major(p, x, ctx, dkey)
    hm = attn_head_major(p, x, ctx, dkey)
    rel = abs(float(ref) - float(hm)) / max(abs(float(ref)), 1e-9)

    results = {"rng_impl": rng_impl, "B": B, "LQ": LQ, "LK": LK,
               "head_major_rel_err": rel}
    for name, fn in variants.items():
        results[name + "_fwd_ms"] = round(
            measure(fn, p, x, ctx, dkey, grad=False), 4)
        results[name + "_fwdbwd_ms"] = round(
            measure(fn, p, x, ctx, dkey, grad=True), 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
