"""Device-side batched DTW / nDTW.

The reference computes cal_dtw on the host per sample per RL step
(``agent_cmt.py:289,416``, O(P*R) python DP). For large batches the
framework can instead ship the per-sample cost matrices to the device
and run the whole batch's DP as one ``lax.scan`` — the inner dimension
(reference path, R <= ~15) is vectorized, the scan runs over prediction
steps, and the batch dimension is fully parallel on the VPU.

Used for batch reward shaping when the host incremental nDTW
(:class:`vln_hamt_tpu.eval.metrics.IncrementalNDTW`) becomes the
bottleneck at large batch sizes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.float32(1e18)


@partial(jax.jit, static_argnames=())
def dtw_ndtw_device(
    cost: jnp.ndarray,  # (B, P, R) pairwise node distances pred x ref
    pred_len: jnp.ndarray,  # (B,) int32
    ref_len: jnp.ndarray,  # (B,) int32
    threshold: float = 3.0,
) -> jnp.ndarray:
    """Batched nDTW over padded cost matrices. Returns (B,)."""
    b, p_max, r_max = cost.shape
    j_idx = jnp.arange(1, r_max + 1)

    init = jnp.full((b, r_max + 1), BIG).at[:, 0].set(0.0)

    def outer(prev, xs):
        cost_i, i = xs  # (B, R), scalar

        def inner(cur_jm1, xs_j):
            c_j, prev_j, prev_jm1 = xs_j  # (B,), (B,), (B,)
            best = jnp.minimum(jnp.minimum(prev_j, prev_jm1), cur_jm1)
            cur_j = c_j + best
            return cur_j, cur_j

        _, cur_rest = jax.lax.scan(
            inner,
            jnp.full((b,), BIG),
            (cost_i.T, prev[:, 1:].T, prev[:, :-1].T),
        )
        cur = jnp.concatenate([jnp.full((b, 1), BIG), cur_rest.T], axis=1)
        # only advance rows that are within each sample's pred length
        take = (i < pred_len)[:, None]
        new_prev = jnp.where(take, cur, prev)
        # column 0 stays open only before the first row
        new_prev = new_prev.at[:, 0].set(jnp.where(i < pred_len, BIG, prev[:, 0]))
        return new_prev, None

    prev, _ = jax.lax.scan(outer, init, (jnp.moveaxis(cost, 1, 0),
                                         jnp.arange(p_max)))
    # mask padded reference columns out of the final read
    dtw = jnp.take_along_axis(prev, ref_len[:, None], axis=1).squeeze(1)
    return jnp.exp(-dtw / (threshold * jnp.maximum(ref_len, 1)))
