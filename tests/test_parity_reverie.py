"""Numerical parity vs the reference torch NavRefCMT (REVERIE model).

Instantiates the ACTUAL reference model (finetune_src/reverie/
vlnbert_navref.py — pure torch+transformers), converts its weights
through ``convert_navcmt_state_dict`` (which auto-detects the object
head), and pins ``HAMT.plan_ref`` act/obj logits + agent state to the
reference 'visual' forward at <= 2e-4 — for BOTH ``no_lang_ca``
settings. The REVERIE preset trains with ``--no_lang_ca``
(scripts/run_reverie.sh:27), and NavRefCMT's no_lang_ca semantics
differ from NavCMT's: there is NO per-layer lang-state precompute
(vlnbert_navref.py:69-84), the x-layers pass the text stream through
unchanged, and the ref_object head (:156) sees the INITIAL text
encoding.

Also covers the released-checkpoint format: the reverie agent inherits
Seq2SeqCMTAgent.save (agent_cmt.py:607-622), so its files carry the
NavRefModel WRAPPER state dict (inner module 'vln_bert',
model_navref.py:79) under DDP 'module.' prefixes.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vln_hamt_tpu.configs import ModelConfig
from vln_hamt_tpu.models.convert import (
    convert_navcmt_state_dict,
    load_reference_checkpoint,
)
from vln_hamt_tpu.models.hamt import HAMT

REF_PATH = "/root/reference/finetune_src"

H, HEADS, INTER, IMG, OBJ_FEAT, VOCAB = 48, 4, 96, 16, 24, 60
L_LAYERS, X_LAYERS, PANO_LAYERS = 2, 2, 1
B, L, HIST, NOB, NOBJ = 2, 7, 3, 12, 5


def _make_ref_navref(no_lang_ca=True):
    sys.path.insert(0, REF_PATH)
    try:
        from reverie.vlnbert_navref import NavRefCMT
    finally:
        sys.path.remove(REF_PATH)
    from transformers import BertConfig

    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=L_LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=32, type_vocab_size=2,
    )
    cfg.img_feature_type = ""
    cfg.image_feat_size = IMG
    cfg.obj_feat_size = OBJ_FEAT
    cfg.angle_feat_size = 4
    cfg.num_l_layers = L_LAYERS
    cfg.num_r_layers = 0
    cfg.num_h_layers = 0
    cfg.num_x_layers = X_LAYERS
    cfg.hist_enc_pano = True
    cfg.num_h_pano_layers = PANO_LAYERS
    cfg.fix_lang_embedding = False
    cfg.fix_hist_embedding = False
    cfg.fix_obs_embedding = False
    cfg.update_lang_bert = True
    cfg.output_attentions = False
    cfg.pred_head_dropout_prob = 0.1
    cfg.max_action_steps = 8
    cfg.no_lang_ca = no_lang_ca
    cfg.act_pred_token = "ob_txt"  # carried by the preset; unused here
    torch.manual_seed(0)
    model = NavRefCMT(cfg)
    model.eval()
    return model


def _flax_cfg(no_lang_ca=True):
    return ModelConfig(
        vocab_size=VOCAB, hidden_size=H, num_attention_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=32,
        num_l_layers=L_LAYERS, num_x_layers=X_LAYERS,
        num_h_pano_layers=PANO_LAYERS, image_feat_size=IMG,
        obj_feat_size=OBJ_FEAT, max_action_steps=8,
        no_lang_ca=no_lang_ca,
    )


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    txt_ids = rng.integers(1, VOCAB, (B, L)).astype(np.int64)
    txt_mask = np.ones((B, L), bool)
    txt_mask[1, 5:] = False
    nav = np.zeros((B, NOB), np.int64)
    nav[:, :4] = 1
    nav[:, 4] = 2
    hist_tokens = rng.standard_normal((B, HIST, H)).astype(np.float32)
    hist_mask = np.ones((B, HIST), bool)
    hist_mask[1, 2:] = False
    ob_mask = np.ones((B, NOB), bool)
    ob_mask[:, 10:] = False
    obj_mask = np.ones((B, NOBJ), bool)
    obj_mask[0, 3:] = False
    return {
        "txt_ids": txt_ids,
        "txt_mask": txt_mask,
        "ob_img": rng.standard_normal((B, NOB, IMG)).astype(np.float32),
        "ob_ang": rng.standard_normal((B, NOB, 4)).astype(np.float32) * 0.3,
        "ob_nav": nav,
        "ob_mask": ob_mask,
        "hist_tokens": hist_tokens,
        "hist_mask": hist_mask,
        "obj_fts": rng.standard_normal((B, NOBJ, OBJ_FEAT)).astype(np.float32),
        "obj_angs": rng.standard_normal((B, NOBJ, 4)).astype(np.float32) * 0.3,
        "obj_pos": rng.standard_normal((B, NOBJ, 5)).astype(np.float32) * 0.2,
        "obj_mask": obj_mask,
    }


def _plan_ref_parity(no_lang_ca):
    ref = _make_ref_navref(no_lang_ca)
    params = convert_navcmt_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_l_layers=L_LAYERS, num_x_layers=X_LAYERS,
        num_h_pano_layers=PANO_LAYERS, has_objects=True,
    )
    model = HAMT(_flax_cfg(no_lang_ca))
    inp = _inputs(2)

    with torch.no_grad():
        # NavRefCMT 'language' mode returns ONE tensor even under
        # no_lang_ca (vlnbert_navref.py:69-84 — no precompute loop)
        t_txt = ref("language", txt_ids=torch.from_numpy(inp["txt_ids"]),
                    txt_masks=torch.from_numpy(inp["txt_mask"]))
        (act_logits, obj_logits, txt_out, hist_out,
         ob_out, obj_out) = ref(
            "visual",
            txt_embeds=t_txt,
            txt_masks=torch.from_numpy(inp["txt_mask"]),
            hist_embeds=torch.from_numpy(inp["hist_tokens"]),
            hist_masks=torch.from_numpy(inp["hist_mask"]),
            ob_img_feats=torch.from_numpy(inp["ob_img"]),
            ob_ang_feats=torch.from_numpy(inp["ob_ang"]),
            ob_nav_types=torch.from_numpy(inp["ob_nav"]),
            ob_masks=torch.from_numpy(inp["ob_mask"]),
            obj_feats=torch.from_numpy(inp["obj_fts"]),
            obj_angles=torch.from_numpy(inp["obj_angs"]),
            obj_poses=torch.from_numpy(inp["obj_pos"]),
            obj_masks=torch.from_numpy(inp["obj_mask"]),
        )
        want_act = act_logits.numpy()
        want_obj = obj_logits.numpy()
        # agent state (model_navref.py:127-130)
        if no_lang_ca:
            want_state = hist_out[:, 0].numpy()
        else:
            want_state = (txt_out[:, 0] * hist_out[:, 0]).numpy()

    # our encode_text still returns the (X+1, B, L, D) stack under
    # no_lang_ca (shared transport with NavCMT); plan_ref must only use
    # index 0 — that equivalence is exactly what this test pins
    j_txt = model.apply({"params": params}, jnp.asarray(inp["txt_ids"]),
                        jnp.asarray(inp["txt_mask"]),
                        method=HAMT.encode_text)
    got_act, got_obj, got_state = model.apply(
        {"params": params}, j_txt, jnp.asarray(inp["txt_mask"]),
        jnp.asarray(inp["hist_tokens"]), jnp.asarray(inp["hist_mask"]),
        jnp.asarray(inp["ob_img"]), jnp.asarray(inp["ob_ang"]),
        jnp.asarray(inp["ob_nav"]), jnp.asarray(inp["ob_mask"]),
        jnp.asarray(inp["obj_fts"]), jnp.asarray(inp["obj_angs"]),
        jnp.asarray(inp["obj_pos"]), jnp.asarray(inp["obj_mask"]),
        method=HAMT.plan_ref)
    got_act, got_obj = np.asarray(got_act), np.asarray(got_obj)

    finite = np.isfinite(want_act)
    np.testing.assert_allclose(got_act[finite], want_act[finite], atol=2e-4)
    assert np.all(got_act[~finite] == -np.inf)
    ofinite = np.isfinite(want_obj)
    np.testing.assert_allclose(got_obj[ofinite], want_obj[ofinite], atol=2e-4)
    assert np.all(got_obj[~ofinite] == -np.inf)
    np.testing.assert_allclose(np.asarray(got_state), want_state, atol=2e-4)


def test_plan_ref_parity_no_lang_ca():
    """The REVERIE production configuration (run_reverie.sh:27)."""
    _plan_ref_parity(no_lang_ca=True)


def test_plan_ref_parity_lang_ca():
    _plan_ref_parity(no_lang_ca=False)


def test_reference_navref_checkpoint_roundtrip(tmp_path):
    """A reverie agent checkpoint FILE (inherited Seq2SeqCMTAgent.save
    format with the NavRefModel wrapper's 'vln_bert.' inner prefix +
    DDP 'module.') must convert through load_reference_checkpoint into
    exactly the same tree as the direct NavRefCMT conversion, critic
    included."""
    ref = _make_ref_navref(no_lang_ca=True)
    torch.manual_seed(4)
    critic_sd = {
        "module.state2value.0.weight": torch.randn(512, H),
        "module.state2value.0.bias": torch.randn(512),
        "module.state2value.3.weight": torch.randn(1, 512),
        "module.state2value.3.bias": torch.randn(1),
    }
    path = str(tmp_path / "ref_navref_agent.pt")
    torch.save({
        "vln_bert": {"epoch": 3, "state_dict": {
            "module.vln_bert." + k: v for k, v in ref.state_dict().items()}},
        "critic": {"epoch": 3, "state_dict": critic_sd},
    }, path)

    got, critic = load_reference_checkpoint(path)
    assert critic is not None
    want = convert_navcmt_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_l_layers=L_LAYERS, num_x_layers=X_LAYERS,
        num_h_pano_layers=PANO_LAYERS, has_objects=True)
    flat_got = jax.tree_util.tree_leaves_with_path(got)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(flat_got) == len(flat_want)
    # the object head converted (not silently dropped)
    assert "ref_dense1" in got and "obj_img_linear" in got
    for path_, leaf in flat_got:
        np.testing.assert_array_equal(leaf, flat_want[path_])
    np.testing.assert_allclose(
        np.asarray(critic["Dense_0"]["kernel"]),
        critic_sd["module.state2value.0.weight"].numpy().T, atol=1e-6)
