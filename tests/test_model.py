import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_hamt_tpu.configs import ModelConfig
from vln_hamt_tpu.models.hamt import HAMT, Critic, init_hamt_params
from vln_hamt_tpu.models.layers import erf_gelu


TINY = ModelConfig(
    hidden_size=64,
    num_attention_heads=4,
    intermediate_size=128,
    num_l_layers=2,
    num_x_layers=2,
    num_h_pano_layers=1,
    image_feat_size=32,
    vocab_size=100,
    max_action_steps=20,
    max_position_embeddings=64,
)
B, L, H, N, V = 2, 8, 4, 20, 36


@pytest.fixture(scope="module")
def tiny_model():
    model, critic, params, cparams = init_hamt_params(
        TINY, jax.random.PRNGKey(0), views=V, num_ob_tokens=N, instr_len=L,
        hist_len=H,
    )
    return model, critic, params, cparams


def _plan_inputs(rng=0, nav_valid=5):
    r = np.random.default_rng(rng)
    nav = np.zeros((B, N), np.int32)
    nav[:, :nav_valid] = 1
    nav[:, nav_valid] = 2
    return dict(
        ob_img=jnp.asarray(r.standard_normal((B, N, 32), np.float32)),
        ob_ang=jnp.asarray(r.standard_normal((B, N, 4), np.float32)),
        ob_nav=jnp.asarray(nav),
        ob_mask=jnp.ones((B, N), bool),
    )


def test_erf_gelu_matches_reference_formula():
    import math

    x = np.linspace(-3, 3, 7, dtype=np.float32)
    got = np.asarray(erf_gelu(jnp.asarray(x)))
    want = x * 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_plan_shapes_and_masking(tiny_model):
    model, critic, params, cparams = tiny_model
    txt = model.apply({"params": params}, jnp.ones((B, L), jnp.int32),
                      jnp.ones((B, L), bool), method=HAMT.encode_text)
    h0 = model.apply({"params": params}, B, method=HAMT.init_history)
    hist = jnp.zeros((B, H, 64)).at[:, 0].set(h0)
    hist_mask = jnp.broadcast_to(jnp.arange(H)[None] < 1, (B, H))
    inp = _plan_inputs()
    logits, state = model.apply({"params": params}, txt, jnp.ones((B, L), bool),
                                hist, hist_mask, **inp, method=HAMT.plan)
    assert logits.shape == (B, N)
    assert state.shape == (B, 64)
    # valid slots finite, non-navigable -inf
    assert bool(jnp.isfinite(logits[:, :6]).all())
    assert np.all(np.asarray(logits[:, 6:]) == -np.inf)
    v = critic.apply({"params": cparams}, state)
    assert v.shape == (B,)


def test_text_padding_invariance(tiny_model):
    """Padded text tokens must not change outputs (mask correctness)."""
    model, _, params, _ = tiny_model
    ids = np.ones((B, L), np.int32) * 7
    mask = np.ones((B, L), bool)
    mask[:, 5:] = False
    ids_a = ids.copy()
    ids_b = ids.copy()
    ids_b[:, 5:] = 93  # garbage in padded region
    out_a = model.apply({"params": params}, jnp.asarray(ids_a), jnp.asarray(mask),
                        method=HAMT.encode_text)
    out_b = model.apply({"params": params}, jnp.asarray(ids_b), jnp.asarray(mask),
                        method=HAMT.encode_text)
    np.testing.assert_allclose(np.asarray(out_a[:, :5]), np.asarray(out_b[:, :5]),
                               atol=2e-5)


def test_history_mask_invariance(tiny_model):
    """Tokens beyond hist_len must not affect plan outputs."""
    model, _, params, _ = tiny_model
    txt = model.apply({"params": params}, jnp.ones((B, L), jnp.int32),
                      jnp.ones((B, L), bool), method=HAMT.encode_text)
    h0 = model.apply({"params": params}, B, method=HAMT.init_history)
    hist_a = jnp.zeros((B, H, 64)).at[:, 0].set(h0)
    hist_b = hist_a.at[:, 2:].set(99.0)  # garbage beyond length 2
    tok = model.apply({"params": params}, jnp.ones((B, 32)), jnp.ones((B, 4)), 0,
                      jnp.ones((B, V, 32)), jnp.ones((B, V, 4)),
                      method=HAMT.encode_history)
    hist_a = hist_a.at[:, 1].set(tok)
    hist_b = hist_b.at[:, 1].set(tok)
    hist_mask = jnp.broadcast_to(jnp.arange(H)[None] < 2, (B, H))
    inp = _plan_inputs()
    la, sa = model.apply({"params": params}, txt, jnp.ones((B, L), bool),
                         hist_a, hist_mask, **inp, method=HAMT.plan)
    lb, sb = model.apply({"params": params}, txt, jnp.ones((B, L), bool),
                         hist_b, hist_mask, **inp, method=HAMT.plan)
    np.testing.assert_allclose(np.asarray(la[:, :6]), np.asarray(lb[:, :6]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), atol=2e-5)


def test_no_lang_ca_variant():
    cfg = dataclasses.replace(TINY, no_lang_ca=True)
    model, critic, params, cparams = init_hamt_params(
        cfg, jax.random.PRNGKey(1), views=V, num_ob_tokens=N, instr_len=L,
        hist_len=H,
    )
    txt = model.apply({"params": params}, jnp.ones((B, L), jnp.int32),
                      jnp.ones((B, L), bool), method=HAMT.encode_text)
    # stacked per-x-layer states: X+1 entries
    assert txt.shape == (cfg.num_x_layers + 1, B, L, 64)
    h0 = model.apply({"params": params}, B, method=HAMT.init_history)
    hist = jnp.zeros((B, H, 64)).at[:, 0].set(h0)
    hist_mask = jnp.broadcast_to(jnp.arange(H)[None] < 1, (B, H))
    inp = _plan_inputs()
    logits, state = model.apply({"params": params}, txt, jnp.ones((B, L), bool),
                                hist, hist_mask, **inp, method=HAMT.plan)
    assert logits.shape == (B, N)


def test_act_pred_token_variants(tiny_model):
    _, _, params, _ = tiny_model
    for variant in ["ob", "ob_txt", "ob_hist", "ob_txt_hist"]:
        cfg = dataclasses.replace(TINY, act_pred_token=variant)
        model = HAMT(cfg)
        txt = model.apply({"params": params}, jnp.ones((B, L), jnp.int32),
                          jnp.ones((B, L), bool), method=HAMT.encode_text)
        h0 = model.apply({"params": params}, B, method=HAMT.init_history)
        hist = jnp.zeros((B, H, 64)).at[:, 0].set(h0)
        hist_mask = jnp.broadcast_to(jnp.arange(H)[None] < 1, (B, H))
        inp = _plan_inputs()
        logits, _ = model.apply({"params": params}, txt, jnp.ones((B, L), bool),
                                hist, hist_mask, **inp, method=HAMT.plan)
        assert bool(jnp.isfinite(logits[:, :6]).all()), variant


def test_bfloat16_compute(tiny_model):
    _, _, params, _ = tiny_model
    cfg = dataclasses.replace(TINY, dtype="bfloat16")
    model = HAMT(cfg)
    txt = model.apply({"params": params}, jnp.ones((B, L), jnp.int32),
                      jnp.ones((B, L), bool), method=HAMT.encode_text)
    assert txt.dtype == jnp.bfloat16
    h0 = model.apply({"params": params}, B, method=HAMT.init_history)
    hist = jnp.zeros((B, H, 64), jnp.bfloat16).at[:, 0].set(h0)
    hist_mask = jnp.broadcast_to(jnp.arange(H)[None] < 1, (B, H))
    inp = _plan_inputs()
    logits, state = model.apply({"params": params}, txt, jnp.ones((B, L), bool),
                                hist, hist_mask, **inp, method=HAMT.plan)
    # logits/state always come back float32 for stable losses
    assert logits.dtype == jnp.float32
    assert state.dtype == jnp.float32


def test_dropout_stochastic_but_keyed(tiny_model):
    model, _, params, _ = tiny_model
    ids = jnp.ones((B, L), jnp.int32)
    mask = jnp.ones((B, L), bool)
    k = jax.random.PRNGKey(3)
    a = model.apply({"params": params}, ids, mask, False,
                    method=HAMT.encode_text, rngs={"dropout": k})
    b = model.apply({"params": params}, ids, mask, False,
                    method=HAMT.encode_text, rngs={"dropout": k})
    c = model.apply({"params": params}, ids, mask, False,
                    method=HAMT.encode_text,
                    rngs={"dropout": jax.random.PRNGKey(4)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
