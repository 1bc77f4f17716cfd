"""Training losses (pure jax).

Parity targets in ``finetune_src/r2r/agent_cmt.py``:
- IL: summed cross entropy with ignore index (-100), scaled by
  ``train_ml / batch_size`` (agent_cmt.py:81,339,520-521; the reference's
  deprecated ``size_average=False`` means SUM reduction).
- A2C: reversed-time discounted returns with value bootstrap for
  unfinished episodes, advantage-weighted policy gradient, 0.5 L2 critic
  loss, entropy bonus (agent_cmt.py:476-518).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

IGNORE_ID = -100


def masked_log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    """log_softmax tolerant of -inf masked entries."""
    mx = jnp.max(jnp.where(jnp.isfinite(logits), logits, -jnp.inf), axis=-1,
                 keepdims=True)
    shifted = logits - jax.lax.stop_gradient(mx)
    # exp(-inf) = 0 contributes nothing to the denominator
    lse = jnp.log(jnp.sum(jnp.where(jnp.isfinite(shifted), jnp.exp(shifted), 0.0),
                          axis=-1, keepdims=True))
    return shifted - lse


def il_loss(logits: jnp.ndarray, targets: jnp.ndarray,
            ignore_id: int = IGNORE_ID) -> jnp.ndarray:
    """Summed masked CE. logits (..., N); targets (...) int32."""
    logp = masked_log_softmax(logits)
    valid = targets != ignore_id
    tgt = jnp.where(valid, targets, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1).squeeze(-1)
    return jnp.sum(jnp.where(valid, nll, 0.0))


def entropy_from_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Categorical entropy over the valid (finite-logit) support.

    NaN-safe under autodiff: multiplying by a raw ``logp = -inf`` would
    put ``0 * -inf`` into the VJP product at masked entries, poisoning
    the whole gradient. Clamping the multiplicand keeps both the value
    (p = 0 there) and the cotangent exact.
    """
    logp = masked_log_softmax(logits)
    p = jnp.exp(logp)
    safe_logp = jnp.where(jnp.isfinite(logp), logp, 0.0)
    return -jnp.sum(p * safe_logp, axis=-1)


def discounted_returns(rewards: jnp.ndarray, masks: jnp.ndarray,
                       last_value: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """(T, B) rewards/masks + (B,) bootstrap -> (T, B) returns.

    Reference recurrence (agent_cmt.py:481-489): the bootstrap seeds the
    accumulator only for episodes still alive at the horizon (reward rows
    of finished episodes are zero beyond their stop step, so the zeroed
    tail just decays the bootstrap — matching the reference, which
    likewise never re-zeroes the accumulator mid-scan).
    """

    def step(carry, xs):
        r_t, = xs
        acc = carry * gamma + r_t
        return acc, acc

    _, rets = jax.lax.scan(step, last_value, (rewards,), reverse=True)
    return rets


def a2c_loss(
    logits: jnp.ndarray,  # (T, B, N)
    actions: jnp.ndarray,  # (T, B)
    values: jnp.ndarray,  # (T, B) critic outputs (with grad)
    rewards: jnp.ndarray,  # (T, B) shaped rewards (host-computed)
    masks: jnp.ndarray,  # (T, B) 1.0 while alive at step t
    last_value: jnp.ndarray,  # (B,) detached bootstrap, zero where ended
    gamma: float,
    entropy_weight: float,
    normalize: str = "total",
    use_entropy: bool = True,
) -> Tuple[jnp.ndarray, dict]:
    returns = jax.lax.stop_gradient(
        discounted_returns(rewards, masks, last_value, gamma)
    )
    logp = masked_log_softmax(logits)
    act_logp = jnp.take_along_axis(logp, actions[..., None], axis=-1).squeeze(-1)

    adv = jax.lax.stop_gradient(returns - values)
    policy_loss = jnp.sum(-act_logp * adv * masks)
    critic_loss = 0.5 * jnp.sum(((returns - values) ** 2) * masks)
    loss = policy_loss + critic_loss
    ent = entropy_from_logits(logits)
    entropy_loss = -entropy_weight * jnp.sum(ent * masks)
    if use_entropy:
        loss = loss + entropy_loss

    total = jnp.sum(masks)
    if normalize == "total":
        loss = loss / jnp.maximum(total, 1.0)
    elif normalize == "batch":
        loss = loss / logits.shape[1]
    elif normalize != "none":
        raise ValueError(f"bad normalize {normalize!r}")

    aux = {
        "policy_loss": policy_loss,
        "critic_loss": critic_loss,
        "entropy": jnp.sum(ent * masks),
        "total_actions": total,
    }
    return loss, aux
