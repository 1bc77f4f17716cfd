import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vln_hamt_tpu.pretrain.optim import (
    build_pretrain_optimizer,
    noam_schedule,
    scale_by_trust_ratio,
    warmup_linear_schedule,
)


def _params():
    return {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)},
            "LayerNorm": {"scale": jnp.ones(4), "bias": jnp.zeros(4)}}


@pytest.mark.parametrize("name", ["adamw", "adam", "radam", "ralamb"])
def test_optimizers_step(name):
    params = _params()
    grads = jax.tree.map(jnp.ones_like, params)
    tx = build_pretrain_optimizer(name, 1e-3, grad_norm=5.0)
    st = tx.init(params)
    up, st = tx.update(grads, st, params)
    p2 = optax.apply_updates(params, up)
    for x in jax.tree.leaves(p2):
        assert np.isfinite(np.asarray(x)).all()


def test_rangerlars_is_lookahead():
    params = _params()
    tx = build_pretrain_optimizer("rangerlars", 1e-3)
    lp = optax.LookaheadParams.init_synced(params)
    st = tx.init(lp)
    grads = jax.tree.map(jnp.ones_like, params)
    up, st = tx.update(grads, st, lp)
    lp2 = optax.apply_updates(lp, up)
    assert np.isfinite(np.asarray(lp2.fast["dense"]["kernel"])).all()


def test_trust_ratio_scaling():
    tx = scale_by_trust_ratio()
    params = {"w": jnp.full((2, 2), 2.0)}
    updates = {"w": jnp.full((2, 2), 0.5)}
    out, _ = tx.update(updates, tx.init(params), params)
    # ratio = ||w|| / ||u|| = 4 / 1 = 4 -> update 0.5 * 4 = 2
    np.testing.assert_allclose(np.asarray(out["w"]), 2.0, rtol=1e-6)


def test_schedules():
    s = noam_schedule(1e-3, 100)
    assert float(s(100)) == pytest.approx(1e-3, rel=1e-5)
    assert float(s(10_000)) < float(s(100))
    w = warmup_linear_schedule(1e-3, 10, 100)
    assert float(w(0)) == 0.0
    assert float(w(10)) == pytest.approx(1e-3, rel=1e-5)
    assert float(w(100)) == pytest.approx(0.0, abs=1e-9)
    assert float(w(55)) == pytest.approx(1e-3 * 0.5, rel=1e-2)


def test_weight_decay_mask_skips_layernorm_and_bias():
    params = _params()
    grads = jax.tree.map(jnp.zeros_like, params)
    tx = build_pretrain_optimizer("radam", 1.0, weight_decay=0.1)
    st = tx.init(params)
    up, _ = tx.update(grads, st, params)
    # zero grads: only decay moves params; LN/bias must be untouched
    assert np.allclose(np.asarray(up["LayerNorm"]["scale"]), 0.0)
    assert np.allclose(np.asarray(up["dense"]["bias"]), 0.0)
    assert not np.allclose(np.asarray(up["dense"]["kernel"]), 0.0)
