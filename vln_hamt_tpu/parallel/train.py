"""Sharded training step over a ('data', 'model') mesh.

One jitted function: per-shard episode scan forward, loss, grads,
optimizer update. GSPMD lowers the gradient all-reduce over ICI from
the sharding annotations alone — there is no hand-written collective
here (contrast: the reference's DDP wrapper + NCCL all_gather,
``finetune_src/utils/distributed.py``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..configs import HAMTConfig
from ..env.observation import IGNORE_ID
from ..models.hamt import Critic, HAMT
from ..agents.losses import il_loss
from ..agents.rollout import build_episode_forward


def build_sharded_il_train_step(
    model: HAMT,
    critic: Critic,
    cfg: HAMTConfig,
    tx: optax.GradientTransformation,
    ctx: optax.GradientTransformation,
    mesh: Mesh,
):
    """Data/tensor-parallel IL train step.

    Batch leaves are sharded over 'data'; params follow the TP rules
    from :mod:`.mesh` over 'model' (replicated when mesh.model == 1).
    """
    episode_forward = build_episode_forward(model, critic, cfg.model)

    def loss_fn(params, cparams, ep, rng, feat_table):
        out = episode_forward(params, cparams, ep, rng, deterministic=False,
                              feat_table=feat_table)
        teacher = jnp.moveaxis(ep["teacher"], 0, 1)
        b = ep["actions"].shape[0]
        loss = il_loss(out.logits, teacher, IGNORE_ID) * cfg.train.ml_weight / b
        return loss, {"IL_loss": loss}

    def train_step(params, cparams, opt_state, copt_state, ep, rng,
                   feat_table=None):
        # feat_table: replicated (N, V, D) device table when the episode
        # carries node_idx; the gather happens per data shard
        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                has_aux=True)(
            params, cparams, ep, rng, feat_table
        )
        gp, gc = grads
        updates, opt_state = tx.update(gp, opt_state, params)
        params = optax.apply_updates(params, updates)
        cupdates, copt_state = ctx.update(gc, copt_state, cparams)
        cparams = optax.apply_updates(cparams, cupdates)
        return params, cparams, opt_state, copt_state, loss, aux

    # Shardings are carried by the inputs themselves (shard_params /
    # shard_batch place them on the mesh); jit propagates them and GSPMD
    # inserts the cross-replica collectives.
    return jax.jit(train_step, donate_argnums=(0, 1, 2, 3))


def build_sharded_pretrain_step(model, tx: optax.GradientTransformation,
                                mesh: Mesh):
    """Data/tensor-parallel proxy-task pretraining step.

    The reference pretrains with DDP over 4 GPUs (README.md:53-60,
    pretrain_src/utils/misc.py:52-65); here the same scaling is a
    mesh-placement decision: batch leaves sharded over 'data', params
    over the 'model' TP rules. ``task`` is static (one program per
    task, as in the single-chip trainer).
    """

    def train_step(params, opt_state, batch, rng, task):
        def loss_fn(p):
            loss, aux = model.apply({"params": p}, batch, task,
                                    deterministic=False,
                                    rngs={"dropout": rng})
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return jax.jit(train_step, static_argnames=("task",),
                   donate_argnums=(0, 1))
