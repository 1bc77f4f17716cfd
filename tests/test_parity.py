"""Numerical parity vs the reference torch NavCMT.

Instantiates the ACTUAL reference model (finetune_src/models/
vilmodel_cmt.py — pure torch+transformers, no MatterSim needed),
converts its randomly-initialized weights through
``convert_navcmt_state_dict``, and checks that the flax HAMT reproduces
the reference forward outputs for all three modes at <= 1e-4. This is
the checkpoint-reuse guarantee: released reference weights will produce
reference logits.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_PATH = "/root/reference/finetune_src"

import jax
import jax.numpy as jnp

from vln_hamt_tpu.configs import ModelConfig
from vln_hamt_tpu.models.convert import (
    convert_critic_state_dict,
    convert_navcmt_state_dict,
)
from vln_hamt_tpu.models.hamt import Critic, HAMT

H, HEADS, INTER, IMG, VOCAB = 48, 4, 96, 16, 60
L_LAYERS, X_LAYERS, PANO_LAYERS = 2, 2, 1
B, L, HIST, NOB, V = 2, 7, 3, 12, 36


def _make_ref_model(act_pred_token="ob_txt", no_lang_ca=False):
    sys.path.insert(0, REF_PATH)
    try:
        from models.vilmodel_cmt import NavCMT
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
    cfg.act_pred_token = act_pred_token
    torch.manual_seed(0)
    model = NavCMT(cfg)
    model.eval()
    return model


def _flax_cfg(act_pred_token="ob_txt", no_lang_ca=False):
    return ModelConfig(
        vocab_size=VOCAB, hidden_size=H, num_attention_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=32,
        num_l_layers=L_LAYERS, num_x_layers=X_LAYERS,
        num_h_pano_layers=PANO_LAYERS, image_feat_size=IMG,
        max_action_steps=8, act_pred_token=act_pred_token,
        no_lang_ca=no_lang_ca,
    )


@pytest.fixture(scope="module")
def parity_pair():
    ref = _make_ref_model()
    params = convert_navcmt_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_l_layers=L_LAYERS, num_x_layers=X_LAYERS,
        num_h_pano_layers=PANO_LAYERS,
    )
    model = HAMT(_flax_cfg())
    return ref, model, params


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    txt_ids = rng.integers(1, VOCAB, (B, L)).astype(np.int64)
    txt_mask = np.ones((B, L), bool)
    txt_mask[1, 5:] = False
    nav = np.zeros((B, NOB), np.int64)
    nav[:, :4] = 1
    nav[:, 4] = 2
    return {
        "txt_ids": txt_ids,
        "txt_mask": txt_mask,
        "ob_img": rng.standard_normal((B, NOB, IMG)).astype(np.float32),
        "ob_ang": rng.standard_normal((B, NOB, 4)).astype(np.float32) * 0.3,
        "ob_nav": nav,
        "hist_img": rng.standard_normal((B, IMG)).astype(np.float32),
        "hist_ang": rng.standard_normal((B, 4)).astype(np.float32) * 0.3,
        "pano_img": rng.standard_normal((B, V, IMG)).astype(np.float32),
        "pano_ang": rng.standard_normal((B, V, 4)).astype(np.float32) * 0.3,
    }


def test_text_encoder_parity(parity_pair):
    ref, model, params = parity_pair
    inp = _inputs()
    with torch.no_grad():
        want = ref("language", txt_ids=torch.from_numpy(inp["txt_ids"]),
                   txt_masks=torch.from_numpy(inp["txt_mask"])).numpy()
    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(inp["txt_ids"]),
                                 jnp.asarray(inp["txt_mask"]),
                                 method=HAMT.encode_text))
    # compare only non-padded positions
    m = inp["txt_mask"]
    np.testing.assert_allclose(got[m], want[m], atol=1e-4)


def test_history_parity(parity_pair):
    ref, model, params = parity_pair
    inp = _inputs(1)
    # global [CLS] history token (img_feats=None path)
    with torch.no_grad():
        want0 = ref("history").numpy()  # (1, D)
    got0 = np.asarray(model.apply({"params": params}, 1,
                                  method=HAMT.init_history))
    np.testing.assert_allclose(got0, want0, atol=1e-4)

    # per-step token
    with torch.no_grad():
        want = ref(
            "history",
            hist_img_feats=torch.from_numpy(inp["hist_img"]),
            hist_ang_feats=torch.from_numpy(inp["hist_ang"]),
            hist_pano_img_feats=torch.from_numpy(inp["pano_img"]),
            hist_pano_ang_feats=torch.from_numpy(inp["pano_ang"]),
            ob_step_ids=torch.LongTensor([2]),
        ).numpy()
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(inp["hist_img"]),
        jnp.asarray(inp["hist_ang"]), 2, jnp.asarray(inp["pano_img"]),
        jnp.asarray(inp["pano_ang"]), method=HAMT.encode_history))
    np.testing.assert_allclose(got, want, atol=1e-4)


def _plan_parity(act_pred_token, no_lang_ca=False):
    ref = _make_ref_model(act_pred_token, no_lang_ca)
    params = convert_navcmt_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_l_layers=L_LAYERS, num_x_layers=X_LAYERS,
        num_h_pano_layers=PANO_LAYERS,
    )
    model = HAMT(_flax_cfg(act_pred_token, no_lang_ca))
    inp = _inputs(2)
    rng = np.random.default_rng(3)
    hist_tokens = rng.standard_normal((B, HIST, H)).astype(np.float32)
    hist_mask = np.ones((B, HIST), bool)
    hist_mask[1, 2:] = False
    ob_mask = np.ones((B, NOB), bool)
    ob_mask[:, 10:] = False

    with torch.no_grad():
        t_txt = ref("language", txt_ids=torch.from_numpy(inp["txt_ids"]),
                    txt_masks=torch.from_numpy(inp["txt_mask"]))
        if no_lang_ca:
            t_txt_in = [x for x in t_txt]
        else:
            t_txt_in = t_txt
        act_logits, txt_out, hist_out, ob_out = ref(
            "visual",
            txt_embeds=(torch.stack(t_txt_in) if no_lang_ca else t_txt_in),
            txt_masks=torch.from_numpy(inp["txt_mask"]),
            hist_embeds=torch.from_numpy(hist_tokens),
            hist_masks=torch.from_numpy(hist_mask),
            ob_img_feats=torch.from_numpy(inp["ob_img"]),
            ob_ang_feats=torch.from_numpy(inp["ob_ang"]),
            ob_nav_types=torch.from_numpy(inp["ob_nav"]),
            ob_masks=torch.from_numpy(ob_mask),
        )
        want_logits = act_logits.numpy()
        if no_lang_ca:
            want_state = hist_out[:, 0].numpy()
        else:
            want_state = (txt_out[:, 0] * hist_out[:, 0]).numpy()

    j_txt = model.apply({"params": params}, jnp.asarray(inp["txt_ids"]),
                        jnp.asarray(inp["txt_mask"]), method=HAMT.encode_text)
    got_logits, got_state = model.apply(
        {"params": params}, j_txt, jnp.asarray(inp["txt_mask"]),
        jnp.asarray(hist_tokens), jnp.asarray(hist_mask),
        jnp.asarray(inp["ob_img"]), jnp.asarray(inp["ob_ang"]),
        jnp.asarray(inp["ob_nav"]), jnp.asarray(ob_mask), method=HAMT.plan)
    got_logits = np.asarray(got_logits)
    finite = np.isfinite(want_logits)
    np.testing.assert_allclose(got_logits[finite], want_logits[finite],
                               atol=2e-4)
    assert np.all(got_logits[~finite] == -np.inf)
    np.testing.assert_allclose(np.asarray(got_state), want_state, atol=2e-4)


def test_plan_parity_ob_txt(parity_pair):
    _plan_parity("ob_txt")


def test_plan_parity_no_lang_ca():
    """The no_lang_ca branch (vilmodel_cmt.py:645-652 precomputed
    per-layer lang states + :701-711 fixed-lang x-layers): 4 of the 7
    task presets (rxr/r4r/reverie/cvdn) train with it, so
    reference-weight parity for those tasks rests on this path. Note
    under no_lang_ca the reference IGNORES act_pred_token
    (:717-718: logits from ob_embeds alone) and the agent state is
    hist[CLS] (model_HAMT.py:61-63)."""
    _plan_parity("ob_txt", no_lang_ca=True)


@pytest.mark.slow
def test_plan_parity_variants():
    for variant in ("ob", "ob_hist", "ob_txt_hist"):
        _plan_parity(variant)
    # act_pred_token is ignored under no_lang_ca, but the preset files
    # still carry variant values — pin that combination too
    _plan_parity("ob", no_lang_ca=True)


def test_hf_bert_init_parity():
    """BERT-init path: converted HF weights must reproduce the HF text
    encoding through our lang stack (main_r2r.py:131-144 equivalent)."""
    from transformers import BertConfig, BertModel

    from vln_hamt_tpu.models.convert import convert_hf_bert_state_dict, merge_params
    from vln_hamt_tpu.models.hamt import init_hamt_params

    hf_cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=L_LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(2)
    bert = BertModel(hf_cfg, add_pooling_layer=False)
    bert.eval()

    partial = convert_hf_bert_state_dict(
        {k: v.detach().numpy() for k, v in bert.state_dict().items()},
        num_l_layers=L_LAYERS,
    )
    cfg = _flax_cfg()
    import jax as _jax

    model, _, params, _ = init_hamt_params(cfg, _jax.random.PRNGKey(0),
                                           num_ob_tokens=NOB, instr_len=L,
                                           hist_len=HIST)
    params = merge_params(params, partial)

    inp = _inputs(5)
    with torch.no_grad():
        want = bert(torch.from_numpy(inp["txt_ids"]),
                    attention_mask=torch.from_numpy(
                        inp["txt_mask"].astype(np.int64))
                    ).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(inp["txt_ids"]),
                                 jnp.asarray(inp["txt_mask"]),
                                 method=HAMT.encode_text))
    m = inp["txt_mask"]
    np.testing.assert_allclose(got[m], want[m], atol=2e-4)


def test_pretrain_to_finetune_grafting():
    """Pretrained trunk + SAP head must slot into the finetune model."""
    from vln_hamt_tpu.models.convert import pretrain_to_finetune_params
    from vln_hamt_tpu.pretrain.model import init_pretrain_params

    cfg = _flax_cfg()
    import dataclasses
    import jax as _jax

    cfg = dataclasses.replace(cfg, image_prob_size=8)
    _, pp = init_pretrain_params(cfg, _jax.random.PRNGKey(0), views=36,
                                 max_hist_len=3, instr_len=L)
    fp = pretrain_to_finetune_params(pp)
    model = HAMT(cfg)
    inp = _inputs(6)
    hist = np.zeros((B, HIST, H), np.float32)
    logits, state = model.apply(
        {"params": fp},
        model.apply({"params": fp}, jnp.asarray(inp["txt_ids"]),
                    jnp.asarray(inp["txt_mask"]), method=HAMT.encode_text),
        jnp.asarray(inp["txt_mask"]), jnp.asarray(hist),
        jnp.ones((B, HIST), bool), jnp.asarray(inp["ob_img"]),
        jnp.asarray(inp["ob_ang"]), jnp.asarray(inp["ob_nav"]),
        jnp.ones((B, NOB), bool), method=HAMT.plan)
    assert np.isfinite(np.asarray(logits)[np.isfinite(np.asarray(logits))]).all()
    # the grafted action head comes from the pretrain SAP head
    np.testing.assert_array_equal(
        np.asarray(fp["act_dense1"]["kernel"]),
        np.asarray(pp["next_action"]["dense1"]["kernel"]))


def test_critic_parity():
    sys.path.insert(0, REF_PATH)
    try:
        sys.modules.pop("utils", None)
        sys.modules.pop("utils.misc", None)
        from models.model_HAMT import Critic as RefCritic
    finally:
        sys.path.remove(REF_PATH)

    class Args:
        dropout = 0.5

    torch.manual_seed(1)
    ref = RefCritic(Args())
    ref.eval()
    cparams = convert_critic_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    state = np.random.default_rng(0).standard_normal((3, 768)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(state)).numpy()
    critic = Critic(ModelConfig())
    got = np.asarray(critic.apply({"params": cparams}, jnp.asarray(state)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hf_xlmr_init():
    """XLM-R init path (RxR): name-matched load + type-embedding
    duplication (main_r2r.py:138-143); the off-by-+2 position table is
    dropped on shape mismatch, mirroring the reference's silent skip."""
    from transformers import XLMRobertaConfig, XLMRobertaModel

    from vln_hamt_tpu.models.convert import (
        convert_hf_xlmr_state_dict,
        merge_params,
    )
    from vln_hamt_tpu.models.hamt import init_hamt_params

    hf_cfg = XLMRobertaConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=L_LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=32 + 2, type_vocab_size=1,
        hidden_act="gelu", pad_token_id=1,
    )
    torch.manual_seed(3)
    xlmr = XLMRobertaModel(hf_cfg, add_pooling_layer=False)
    sd = {k: v.detach().numpy() for k, v in xlmr.state_dict().items()}
    partial = convert_hf_xlmr_state_dict(sd, num_l_layers=L_LAYERS,
                                         max_position_embeddings=32)
    # type embedding duplicated 1 -> 2; mismatched position table dropped
    assert partial["embeddings"]["token_type_embeddings"]["embedding"].shape[0] == 2
    assert "position_embeddings" not in partial["embeddings"]

    cfg = _flax_cfg()
    import jax as _jax

    model, _, params, _ = init_hamt_params(cfg, _jax.random.PRNGKey(0),
                                           num_ob_tokens=NOB, instr_len=L,
                                           hist_len=HIST)
    params = merge_params(params, partial)
    np.testing.assert_array_equal(
        params["embeddings"]["word_embeddings"]["embedding"],
        sd["embeddings.word_embeddings.weight"])
    np.testing.assert_array_equal(
        params["lang_layers"]["layer_0"]["attention"]["att"]["query"]["kernel"],
        sd["encoder.layer.0.attention.self.query.weight"].T)

    inp = _inputs(5)
    out = np.asarray(model.apply({"params": params},
                                 jnp.asarray(inp["txt_ids"]),
                                 jnp.asarray(inp["txt_mask"]),
                                 method=HAMT.encode_text))
    assert np.isfinite(out).all()


def _remap_tokens(items, vocab):
    """Clamp synthetic instruction tokens into a tiny test vocab."""
    for it in items:
        it["instr_encoding"] = [1 + (t % (vocab - 1))
                                for t in it["instr_encoding"]]
    return items


def test_reference_agent_checkpoint_into_eval(tmp_path):
    """A reference agent checkpoint FILE (the torch format written by
    Seq2SeqCMTAgent.save, agent_cmt.py:607-622: the WRAPPER state dicts
    — VLNBertCMT whose inner module is 'vln_bert', model_HAMT.py:13 —
    under 'module.' DDP prefixes, so keys look like
    'module.vln_bert.embeddings...') must round-trip through
    agent.init_from_reference into greedy evaluation — the production
    path for evaluating released checkpoints (--init_ref_ckpt)."""
    from vln_hamt_tpu.agents.agent import HAMTAgent
    from vln_hamt_tpu.configs import HAMTConfig
    from vln_hamt_tpu.data.fixtures import make_synthetic_world
    from vln_hamt_tpu.env import ObsSpec, R2RNavEnv

    ref = _make_ref_model()
    torch.manual_seed(11)
    critic_sd = {
        "module.state2value.0.weight": torch.randn(512, H),
        "module.state2value.0.bias": torch.randn(512),
        "module.state2value.3.weight": torch.randn(1, 512),
        "module.state2value.3.bias": torch.randn(1),
    }
    path = str(tmp_path / "ref_agent.pt")
    torch.save({
        "vln_bert": {"epoch": 7, "state_dict": {
            "module.vln_bert." + k: v for k, v in ref.state_dict().items()}},
        "critic": {"epoch": 7, "state_dict": critic_sd},
    }, path)

    world = make_synthetic_world(num_scans=1, nodes_per_scan=10,
                                 num_items=6, feat_dim=IMG, seed=3)
    items = _remap_tokens(world.instr_data, VOCAB)
    max_deg = max(g.max_degree for g in world.graphs.values())
    cfg = HAMTConfig().replace(
        model=dict(vocab_size=VOCAB, hidden_size=H,
                   num_attention_heads=HEADS, intermediate_size=INTER,
                   max_position_embeddings=32, num_l_layers=L_LAYERS,
                   num_x_layers=X_LAYERS, num_h_pano_layers=PANO_LAYERS,
                   image_feat_size=IMG, max_action_steps=8),
        env=dict(max_action_len=6, max_instr_len=16,
                 max_candidates=max_deg, image_feat_size=IMG),
        train=dict(batch_size=3),
    )
    spec = ObsSpec(max_candidates=max_deg, image_feat_size=IMG)
    env = R2RNavEnv(world.graphs, world.feat_db, items, spec,
                    batch_size=3, max_instr_len=16, max_action_len=6,
                    seed=0)
    agent = HAMTAgent(cfg, env, seed=0)
    skipped = agent.init_from_reference(path)
    assert skipped == [], skipped
    # the reference's action head + critic landed (transposed torch
    # Linear convention)
    np.testing.assert_allclose(
        np.asarray(agent.state.params["act_dense1"]["kernel"]),
        ref.state_dict()["next_action.net.0.weight"].numpy().T,
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(agent.state.cparams["Dense_0"]["kernel"]),
        critic_sd["module.state2value.0.weight"].numpy().T, atol=1e-6)
    preds = agent.eval_split(env)
    assert len(preds) == len(items)
    assert all(p["trajectory"] for p in preds)


def test_reference_pretrain_checkpoint_conversion(tmp_path):
    """The OTHER released-checkpoint format: a pretrain ModelSaver raw
    state dict (bert.* trunk + top-level next_action head, the actual
    --bert_ckpt_file payload). load_reference_checkpoint must apply the
    reference's key remap (vlnbert_init.py:20-31) and produce the same
    tree as the direct NavCMT conversion."""
    from vln_hamt_tpu.models.convert import load_reference_checkpoint

    ref = _make_ref_model()
    sd = ref.state_dict()
    pretrain_sd = {}
    for k, v in sd.items():
        if k.startswith("next_action"):
            pretrain_sd["module." + k] = v  # SAP head at top level
        else:
            pretrain_sd["module.bert." + k] = v
    # a pretrain-only head with no finetune twin must be ignored
    pretrain_sd["module.itm_output.weight"] = torch.randn(2, H)
    path = str(tmp_path / "ref_pretrain.pt")
    torch.save(pretrain_sd, path)

    got, critic = load_reference_checkpoint(path)
    assert critic is None
    want = convert_navcmt_state_dict(
        {k: v.detach().numpy() for k, v in sd.items()},
        num_l_layers=L_LAYERS, num_x_layers=X_LAYERS,
        num_h_pano_layers=PANO_LAYERS)
    flat_got = jax.tree_util.tree_leaves_with_path(got)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(flat_got) == len(flat_want)
    for path_, leaf in flat_got:
        np.testing.assert_array_equal(leaf, flat_want[path_])
