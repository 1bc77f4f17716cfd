"""Pretraining optimizer zoo.

Parity target: ``pretrain_src/optim/`` — AdamW, RAdam, Ralamb
(RAdam + LARS trust ratio), Lookahead, RangerLars = Lookahead(Ralamb),
plus the noam / warmup-linear LR schedules (optim/sched.py) and the
two-group weight-decay split (optim/misc.py:12-37: no decay for bias
and LayerNorm parameters).

Built on optax: ``radam`` and ``lookahead`` are optax-native; the LARS
trust ratio composes as a scale-by-trust-ratio transform, reproducing
Ralamb's update rule.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, optax.Schedule]


def noam_schedule(base_lr: float, warmup_steps: int, model_size: int = 768):
    """lr * min(step^-0.5, step * warmup^-1.5) (optim/sched.py noam)."""

    def sched(step):
        step = jnp.maximum(step, 1)
        return base_lr * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5
        ) * (warmup_steps ** 0.5)

    return sched


def warmup_linear_schedule(lr: float, warmup_steps: int, total_steps: int):
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )


def _no_decay_mask(params):
    """True where weight decay applies (optim/misc.py:12-37: skip bias
    and LayerNorm scale/bias)."""

    def decay(path, _):
        keys = [str(getattr(k, "key", k)) for k in path]
        name = keys[-1] if keys else ""
        if name == "bias":
            return False
        if any("LayerNorm" in k or k.endswith("_ln") or k == "ln" for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decay, params)


def scale_by_trust_ratio() -> optax.GradientTransformation:
    """LARS/LAMB trust ratio (the 'lamb' part of Ralamb,
    optim/ralamb.py): scale each leaf's update by ||w|| / ||u||."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params):
        def scale(u, w):
            wn = jnp.linalg.norm(w)
            un = jnp.linalg.norm(u)
            ratio = jnp.where((wn > 0) & (un > 0), wn / un, 1.0)
            return u * ratio

        return jax.tree.map(scale, updates, params), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_pretrain_optimizer(
    name: str,
    lr: ScalarOrSchedule,
    weight_decay: float = 0.01,
    grad_norm: Optional[float] = None,
    lookahead_sync: int = 6,
    lookahead_alpha: float = 0.5,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """Optimizer factory (pretrain_src/optim parity).

    Names: adamw | adam | radam | ralamb | lookahead(= lookahead-adam) |
    rangerlars (= lookahead(ralamb)).

    ``grad_accum`` composes ``optax.MultiSteps`` INSIDE the lookahead
    wrapper (accumulation sees plain fast-param trees; lookahead's
    sync counter then ticks per micro-batch). Clipping applies to the
    accumulated gradient, as the reference does at step time.

    Note: lookahead variants expect ``optax.LookaheadParams`` trees;
    PretrainTrainer wraps/unwraps when selected.
    """
    if name in ("lookahead", "rangerlars"):
        inner_name = "adam" if name == "lookahead" else "ralamb"
        inner = build_pretrain_optimizer(inner_name, lr, weight_decay,
                                         grad_norm=grad_norm,
                                         grad_accum=grad_accum)
        return optax.lookahead(inner, sync_period=lookahead_sync,
                               slow_step_size=lookahead_alpha)
    if name == "adamw":
        opt = optax.adamw(lr, weight_decay=weight_decay)
    elif name == "adam":
        opt = optax.adam(lr)
    elif name == "radam":
        opt = optax.chain(
            optax.scale_by_radam(),
            optax.add_decayed_weights(weight_decay, mask=_no_decay_mask),
            optax.scale_by_learning_rate(lr),
        )
    elif name == "ralamb":
        opt = optax.chain(
            optax.scale_by_radam(),
            optax.add_decayed_weights(weight_decay, mask=_no_decay_mask),
            scale_by_trust_ratio(),
            optax.scale_by_learning_rate(lr),
        )
    else:
        raise ValueError(f"unknown pretrain optimizer {name!r}")

    if grad_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(grad_norm), opt)
    if grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum)
    return opt
