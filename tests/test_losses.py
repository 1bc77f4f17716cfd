import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_hamt_tpu.agents.losses import (
    IGNORE_ID,
    a2c_loss,
    discounted_returns,
    entropy_from_logits,
    il_loss,
    masked_log_softmax,
)


def test_masked_log_softmax_with_inf():
    logits = jnp.array([[1.0, 2.0, -jnp.inf, 0.5]])
    lp = masked_log_softmax(logits)
    p = np.exp(np.asarray(lp))
    assert p[0, 2] == 0.0
    assert p[0, [0, 1, 3]].sum() == pytest.approx(1.0, rel=1e-5)
    # matches jax.nn.log_softmax over the finite support
    ref = jax.nn.log_softmax(jnp.array([[1.0, 2.0, 0.5]]))
    np.testing.assert_allclose(np.asarray(lp)[0, [0, 1, 3]], np.asarray(ref)[0],
                               rtol=1e-5)


def test_il_loss_matches_manual_ce():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((3, 2, 5), np.float32))
    targets = jnp.asarray([[1, IGNORE_ID], [4, 0], [IGNORE_ID, 2]])
    got = float(il_loss(logits, targets))
    want = 0.0
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    for t in range(3):
        for b in range(2):
            tgt = int(targets[t, b])
            if tgt != IGNORE_ID:
                want -= lp[t, b, tgt]
    assert got == pytest.approx(want, rel=1e-5)


def test_entropy_uniform():
    logits = jnp.zeros((1, 4))
    assert float(entropy_from_logits(logits)[0]) == pytest.approx(np.log(4), rel=1e-5)
    masked = jnp.array([[0.0, 0.0, -jnp.inf, -jnp.inf]])
    assert float(entropy_from_logits(masked)[0]) == pytest.approx(np.log(2), rel=1e-5)


def test_gradients_finite_with_masked_logits():
    """Regression: -inf masked logits must not poison gradients (the
    0 * -inf VJP trap in entropy / log-softmax products)."""
    def ent_loss(x):
        logits = jnp.where(jnp.arange(5) >= 3, -jnp.inf, x)
        return jnp.sum(entropy_from_logits(logits[None]))

    g = jax.grad(ent_loss)(jnp.array([1.0, 2.0, 0.5, 9.0, 9.0]))
    assert np.isfinite(np.asarray(g)).all(), g

    def il(x):
        logits = jnp.where(jnp.arange(5) >= 3, -jnp.inf, x)[None, None]
        return il_loss(logits, jnp.array([[1]]))

    g2 = jax.grad(il)(jnp.array([1.0, 2.0, 0.5, 9.0, 9.0]))
    assert np.isfinite(np.asarray(g2)).all(), g2


def test_discounted_returns_matches_loop():
    """Golden: the reference reversed-time accumulator (agent_cmt.py:481-499)."""
    rng = np.random.default_rng(1)
    t_steps, b = 5, 3
    rewards = rng.standard_normal((t_steps, b)).astype(np.float32)
    masks = np.ones((t_steps, b), np.float32)
    # episode 1 ends at step 2: no rewards/masks afterwards
    rewards[3:, 1] = 0.0
    masks[3:, 1] = 0.0
    last_value = np.array([0.7, 0.0, -0.3], np.float32)  # ended -> 0
    gamma = 0.9

    got = np.asarray(discounted_returns(jnp.asarray(rewards), jnp.asarray(masks),
                                        jnp.asarray(last_value), gamma))
    acc = last_value.copy()
    want = np.zeros_like(rewards)
    for t in range(t_steps - 1, -1, -1):
        acc = acc * gamma + rewards[t]
        want[t] = acc
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_a2c_loss_values():
    t_steps, b, n = 3, 2, 4
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((t_steps, b, n), np.float32))
    actions = jnp.asarray(rng.integers(0, n, (t_steps, b)))
    values = jnp.asarray(rng.standard_normal((t_steps, b), np.float32))
    rewards = jnp.asarray(rng.standard_normal((t_steps, b), np.float32))
    masks = jnp.ones((t_steps, b), jnp.float32)
    last_value = jnp.zeros((b,))

    loss, aux = a2c_loss(logits, actions, values, rewards, masks, last_value,
                         gamma=0.9, entropy_weight=0.01, normalize="total")
    assert np.isfinite(float(loss))
    # manual replication
    returns = np.zeros((t_steps, b), np.float32)
    acc = np.zeros((b,), np.float32)
    for t in range(t_steps - 1, -1, -1):
        acc = acc * 0.9 + np.asarray(rewards)[t]
        returns[t] = acc
    lp = np.asarray(jax.nn.log_softmax(logits, -1))
    act_lp = np.take_along_axis(lp, np.asarray(actions)[..., None], -1).squeeze(-1)
    adv = returns - np.asarray(values)
    pol = np.sum(-act_lp * adv)
    cri = 0.5 * np.sum(adv ** 2)
    p = np.exp(lp)
    ent = -np.sum(p * lp, -1)
    want = (pol + cri - 0.01 * np.sum(ent)) / (t_steps * b)
    assert float(loss) == pytest.approx(want, rel=1e-4)
    assert float(aux["policy_loss"]) == pytest.approx(pol, rel=1e-4)
    assert float(aux["critic_loss"]) == pytest.approx(cri, rel=1e-4)


def test_a2c_gradients_flow_correctly():
    """Advantage must be stop-gradiented: policy grad should not flow
    into values via the advantage, and returns carry no grad."""
    t_steps, b, n = 2, 1, 3
    logits = jnp.zeros((t_steps, b, n))
    actions = jnp.zeros((t_steps, b), jnp.int32)
    rewards = jnp.ones((t_steps, b))
    masks = jnp.ones((t_steps, b))
    last_value = jnp.zeros((b,))

    def loss_of_values(v):
        loss, _ = a2c_loss(logits, actions, v, rewards, masks, last_value,
                           gamma=0.9, entropy_weight=0.0, normalize="none")
        return loss

    v0 = jnp.zeros((t_steps, b))
    g = jax.grad(loss_of_values)(v0)
    # critic loss grad = -(returns - v) = -returns at v=0; policy term
    # contributes nothing to v's grad
    returns = np.zeros((t_steps, b), np.float32)
    acc = np.zeros((b,), np.float32)
    for t in range(t_steps - 1, -1, -1):
        acc = acc * 0.9 + 1.0
        returns[t] = acc
    np.testing.assert_allclose(np.asarray(g), -returns, rtol=1e-5)
