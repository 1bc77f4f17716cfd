"""Numerical parity vs the reference torch pretrain model.

Instantiates the ACTUAL reference ``MultiStepNavCMTPreTraining``
(pretrain_src/model/pretrain_cmt.py over vilmodel.py's
NavPreTrainedModel), converts its weights through
``convert_reference_pretrain_state_dict``, and pins:

- the single-shot encode (NavPreTrainedModel.forward,
  vilmodel.py:591-638) — txt/hist/ob outputs, including the
  full-sequence HistoryEmbeddings path (:507-575) that
  ``encode_history_seq`` mirrors;
- every task head's SCORES with ``compute_loss=False``
  (pretrain_cmt.py:142-262): MLM, SAP, SAR, SpRel, MRC — and the ITM
  scoring head given FIXED negatives (PARITY.md #8: our negatives are
  host-sampled; the reference's in-model sampling is made
  deterministic here by construction — B=2 in-batch negatives have a
  single choice and history length 1 makes ``torch.randperm`` the
  identity).

This makes ``--bert_ckpt_file``-style ingestion of released pretrain
weights numerically (not just structurally) verified.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vln_hamt_tpu.configs import ModelConfig
from vln_hamt_tpu.models.convert import convert_reference_pretrain_state_dict
from vln_hamt_tpu.pretrain.model import HAMTPretrain

REF_PATH = "/root/reference/pretrain_src"

H, HEADS, INTER, IMG, PROB, VOCAB = 48, 4, 96, 16, 11, 60
L_LAYERS, X_LAYERS, PANO_LAYERS = 2, 2, 1
B, L, T, V = 2, 7, 3, 36
NOB = V + 1  # 36 views + STOP (forward_sprel hardcodes 36, :213-215)
ALL_TASKS = ["mlm", "mrc", "itm", "sap", "sar", "sprel"]


@pytest.fixture(scope="module")
def ref_pair():
    sys.path.insert(0, REF_PATH)
    try:
        from model.pretrain_cmt import MultiStepNavCMTPreTraining
    finally:
        sys.path.remove(REF_PATH)
    from transformers import BertConfig

    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=L_LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=32, type_vocab_size=2,
    )
    cfg.pretrain_tasks = ALL_TASKS
    cfg.image_feat_size = IMG
    cfg.angle_feat_size = 4
    cfg.image_prob_size = PROB
    cfg.num_l_layers = L_LAYERS
    cfg.num_r_layers = 0
    cfg.num_h_layers = 0
    cfg.num_x_layers = X_LAYERS
    cfg.hist_enc_pano = True
    cfg.num_h_pano_layers = PANO_LAYERS
    cfg.update_lang_bert = True
    cfg.output_attentions = False
    cfg.pred_head_dropout_prob = 0.1
    cfg.max_action_steps = 8
    torch.manual_seed(0)
    ref = MultiStepNavCMTPreTraining(cfg)
    ref.eval()

    params = convert_reference_pretrain_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    model = HAMTPretrain(ModelConfig(
        vocab_size=VOCAB, hidden_size=H, num_attention_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=32,
        num_l_layers=L_LAYERS, num_x_layers=X_LAYERS,
        num_h_pano_layers=PANO_LAYERS, image_feat_size=IMG,
        image_prob_size=PROB, max_action_steps=8,
    ))
    return ref, model, params


def _inputs(seed=0, hist_len_for_itm=False):
    rng = np.random.default_rng(seed)
    txt_ids = rng.integers(1, VOCAB, (B, L)).astype(np.int64)
    txt_mask = np.ones((B, L), bool)
    txt_mask[1, 5:] = False
    hist_mask = np.ones((B, T + 1), bool)  # [CLS] + T steps
    if hist_len_for_itm:
        # history length 1 per row -> torch.randperm(1) is the identity,
        # making the reference's shuffled ITM negatives deterministic
        hist_mask[:, 2:] = False
    else:
        hist_mask[1, 3:] = False
    nav = np.ones((B, NOB), np.int64)
    nav[:, -1] = 2  # STOP
    nav[:, 4] = 0  # one non-navigable view
    ob_mask = np.ones((B, NOB), bool)
    return {
        "txt_ids": txt_ids,
        "txt_mask": txt_mask,
        "hist_img": rng.standard_normal((B, T, IMG)).astype(np.float32),
        "hist_ang": (rng.standard_normal((B, T, 4)) * 0.3).astype(np.float32),
        "hist_pano_img": rng.standard_normal((B, T, V, IMG)).astype(np.float32),
        "hist_pano_ang": (rng.standard_normal((B, T, V, 4)) * 0.3
                          ).astype(np.float32),
        "hist_mask": hist_mask,
        "ob_img": rng.standard_normal((B, NOB, IMG)).astype(np.float32),
        "ob_ang": (rng.standard_normal((B, NOB, 4)) * 0.3).astype(np.float32),
        "ob_nav": nav,
        "ob_mask": ob_mask,
    }


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _ref_encode(ref, inp, with_obs=True):
    with torch.no_grad():
        return ref.bert(
            _t(inp["txt_ids"]), _t(inp["txt_mask"]),
            _t(inp["hist_img"]), _t(inp["hist_ang"]),
            _t(inp["hist_pano_img"]), _t(inp["hist_pano_ang"]),
            _t(inp["hist_mask"]),
            _t(inp["ob_img"]) if with_obs else None,
            _t(inp["ob_ang"]) if with_obs else None,
            _t(inp["ob_nav"]) if with_obs else None,
            _t(inp["ob_mask"]) if with_obs else None,
        )


def _our_encode(model, params, inp, with_obs=True):
    def run(m):
        return m._encode(
            jnp.asarray(inp["txt_ids"]), jnp.asarray(inp["txt_mask"]),
            jnp.asarray(inp["hist_img"]), jnp.asarray(inp["hist_ang"]),
            jnp.asarray(inp["hist_pano_img"]), jnp.asarray(inp["hist_pano_ang"]),
            jnp.asarray(inp["hist_mask"]),
            jnp.asarray(inp["ob_img"]) if with_obs else None,
            jnp.asarray(inp["ob_ang"]) if with_obs else None,
            jnp.asarray(inp["ob_nav"]) if with_obs else None,
            jnp.asarray(inp["ob_mask"]) if with_obs else None,
            deterministic=True,
        )

    return model.apply({"params": params}, method=run)


def test_encode_parity_with_obs(ref_pair):
    ref, model, params = ref_pair
    inp = _inputs(0)
    want_txt, want_hist, want_ob = [x.numpy() for x in _ref_encode(ref, inp)]
    got_txt, got_hist, got_ob = [np.asarray(x)
                                 for x in _our_encode(model, params, inp)]
    np.testing.assert_allclose(got_txt[inp["txt_mask"]],
                               want_txt[inp["txt_mask"]], atol=2e-4)
    np.testing.assert_allclose(got_hist[inp["hist_mask"]],
                               want_hist[inp["hist_mask"]], atol=2e-4)
    np.testing.assert_allclose(got_ob[inp["ob_mask"]],
                               want_ob[inp["ob_mask"]], atol=2e-4)


def test_encode_parity_no_obs(ref_pair):
    """The MLM/MRC encode (obs absent, vilmodel.py:617-624 None path)."""
    ref, model, params = ref_pair
    inp = _inputs(1)
    want_txt, want_hist, want_ob = _ref_encode(ref, inp, with_obs=False)
    got_txt, got_hist, got_ob = _our_encode(model, params, inp,
                                            with_obs=False)
    assert want_ob is None and got_ob is None
    np.testing.assert_allclose(np.asarray(got_txt)[inp["txt_mask"]],
                               want_txt.numpy()[inp["txt_mask"]], atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_hist)[inp["hist_mask"]],
                               want_hist.numpy()[inp["hist_mask"]], atol=2e-4)


def test_mlm_head_parity(ref_pair):
    ref, model, params = ref_pair
    inp = _inputs(2)
    rng = np.random.default_rng(20)
    txt_labels = np.full((B, L), -1, np.int64)
    masked = rng.random((B, L)) < 0.4
    masked &= inp["txt_mask"]
    txt_labels[masked] = rng.integers(1, VOCAB, masked.sum())
    with torch.no_grad():
        want = ref.forward_mlm(
            _t(inp["txt_ids"]), _t(inp["txt_mask"]),
            _t(inp["hist_img"]), _t(inp["hist_ang"]),
            _t(inp["hist_pano_img"]), _t(inp["hist_pano_ang"]),
            _t(inp["hist_mask"]), _t(txt_labels), compute_loss=False,
        ).numpy()  # (n_masked, VOCAB) in row-major (B, L) order

    def run(m):
        txt_out, _, _ = m._encode(
            jnp.asarray(inp["txt_ids"]), jnp.asarray(inp["txt_mask"]),
            jnp.asarray(inp["hist_img"]), jnp.asarray(inp["hist_ang"]),
            jnp.asarray(inp["hist_pano_img"]), jnp.asarray(inp["hist_pano_ang"]),
            jnp.asarray(inp["hist_mask"]), deterministic=True)
        return m.mlm_head(txt_out, m.hamt.embeddings.word_embeddings)

    got = np.asarray(model.apply({"params": params}, method=run))
    np.testing.assert_allclose(got[masked], want, atol=2e-4)


def test_sap_sar_head_parity(ref_pair):
    ref, model, params = ref_pair
    inp = _inputs(3)
    with torch.no_grad():
        want_sap = ref.forward_sap(
            _t(inp["txt_ids"]), _t(inp["txt_mask"]),
            _t(inp["hist_img"]), _t(inp["hist_ang"]),
            _t(inp["hist_pano_img"]), _t(inp["hist_pano_ang"]),
            _t(inp["hist_mask"]),
            _t(inp["ob_img"]), _t(inp["ob_ang"]), _t(inp["ob_nav"]),
            _t(inp["ob_mask"]), None, compute_loss=False).numpy()
        want_sar = ref.forward_sar(
            _t(inp["txt_ids"]), _t(inp["txt_mask"]),
            _t(inp["hist_img"]), _t(inp["hist_ang"]),
            _t(inp["hist_pano_img"]), _t(inp["hist_pano_ang"]),
            _t(inp["hist_mask"]),
            _t(inp["ob_img"]), _t(inp["ob_ang"]), _t(inp["ob_nav"]),
            _t(inp["ob_mask"]), None, None, compute_loss=False).numpy()

    def run(m):
        txt_out, _, ob_out = m._encode(
            jnp.asarray(inp["txt_ids"]), jnp.asarray(inp["txt_mask"]),
            jnp.asarray(inp["hist_img"]), jnp.asarray(inp["hist_ang"]),
            jnp.asarray(inp["hist_pano_img"]), jnp.asarray(inp["hist_pano_ang"]),
            jnp.asarray(inp["hist_mask"]),
            jnp.asarray(inp["ob_img"]), jnp.asarray(inp["ob_ang"]),
            jnp.asarray(inp["ob_nav"]), jnp.asarray(inp["ob_mask"]),
            deterministic=True)
        sap = m.next_action(ob_out * txt_out[:, :1]).squeeze(-1)
        sap = jnp.where(jnp.asarray(inp["ob_nav"]) == 0, -jnp.inf, sap)
        sar = m.regress_action(txt_out[:, 0])
        return sap, sar

    got_sap, got_sar = [np.asarray(x)
                        for x in model.apply({"params": params}, method=run)]
    finite = np.isfinite(want_sap)
    np.testing.assert_allclose(got_sap[finite], want_sap[finite], atol=2e-4)
    assert np.all(got_sap[~finite] == -np.inf)
    np.testing.assert_allclose(got_sar, want_sar, atol=2e-4)


def test_sprel_mrc_head_parity(ref_pair):
    ref, model, params = ref_pair
    inp = _inputs(4)
    anchor = np.array([3, 17], np.int64)
    mrc_masks = np.zeros((B, T), bool)
    mrc_masks[0, 1] = True
    mrc_masks[1, 0] = True
    mrc_masks[1, 2] = True
    with torch.no_grad():
        want_sprel = ref.forward_sprel(
            _t(inp["txt_ids"]), _t(inp["txt_mask"]),
            _t(inp["hist_img"]), _t(inp["hist_ang"]),
            _t(inp["hist_pano_img"]), _t(inp["hist_pano_ang"]),
            _t(inp["hist_mask"]),
            _t(inp["ob_img"]), _t(inp["ob_ang"]), _t(inp["ob_nav"]),
            _t(inp["ob_mask"]), _t(anchor), None,
            compute_loss=False).numpy()
        want_mrc, _ = ref.forward_mrc(
            _t(inp["txt_ids"]), _t(inp["txt_mask"]),
            _t(inp["hist_img"]), _t(inp["hist_ang"]),
            _t(inp["hist_pano_img"]), _t(inp["hist_pano_ang"]),
            _t(inp["hist_mask"]), _t(mrc_masks),
            _t(np.ones((B, T, PROB), np.float32) / PROB), compute_loss=False)
        want_mrc = want_mrc.numpy()  # (n_masked, PROB) row-major

    def run(m):
        txt_out, hist_out, ob_out = m._encode(
            jnp.asarray(inp["txt_ids"]), jnp.asarray(inp["txt_mask"]),
            jnp.asarray(inp["hist_img"]), jnp.asarray(inp["hist_ang"]),
            jnp.asarray(inp["hist_pano_img"]), jnp.asarray(inp["hist_pano_ang"]),
            jnp.asarray(inp["hist_mask"]),
            jnp.asarray(inp["ob_img"]), jnp.asarray(inp["ob_ang"]),
            jnp.asarray(inp["ob_nav"]), jnp.asarray(inp["ob_mask"]),
            deterministic=True)
        a = jnp.take_along_axis(ob_out, jnp.asarray(anchor)[:, None, None],
                                axis=1)
        views = ob_out[:, :-1]
        sprel = m.sprel_head(
            jnp.concatenate([jnp.broadcast_to(a, views.shape), views], -1))
        # MRC encodes WITHOUT obs (forward_mrc, pretrain_cmt.py:228-231)
        _, hist_no_ob, _ = m._encode(
            jnp.asarray(inp["txt_ids"]), jnp.asarray(inp["txt_mask"]),
            jnp.asarray(inp["hist_img"]), jnp.asarray(inp["hist_ang"]),
            jnp.asarray(inp["hist_pano_img"]), jnp.asarray(inp["hist_pano_ang"]),
            jnp.asarray(inp["hist_mask"]), deterministic=True)
        mrc = m.image_classifier(hist_no_ob[:, 1:])
        return sprel, mrc

    got_sprel, got_mrc = [np.asarray(x)
                          for x in model.apply({"params": params}, method=run)]
    np.testing.assert_allclose(got_sprel, want_sprel, atol=2e-4)
    np.testing.assert_allclose(got_mrc[mrc_masks], want_mrc, atol=2e-4)


def test_itm_head_parity(ref_pair):
    """ITM scoring given FIXED negatives. The reference samples its
    negatives in-model (vilmodel.py:678-711); with B=2 the in-batch
    choice is forced (the only other row) and with history length 1
    every torch.randperm is the identity, so the reference's candidates
    are fully determined — our host-shipped neg_idxs/shuffled_pos
    reproduce them exactly."""
    ref, model, params = ref_pair
    inp = _inputs(5, hist_len_for_itm=True)
    num_negs = 4
    k = num_negs // 2
    with torch.no_grad():
        want, _ = ref.forward_itm(
            _t(inp["txt_ids"]), _t(inp["txt_mask"]),
            _t(inp["hist_img"]), _t(inp["hist_ang"]),
            _t(inp["hist_pano_img"]), _t(inp["hist_pano_ang"]),
            _t(inp["hist_mask"]), num_negs, compute_loss=False)
        want = want.numpy()  # (B, 1 + num_negs)

    neg_idxs = np.array([[1] * k, [0] * k], np.int32)  # the only choice
    # identity permutations (hist len 1, padded tail keeps order)
    shuffled_pos = np.broadcast_to(np.arange(T, dtype=np.int32),
                                   (k, B, T)).copy()
    batch = {
        "txt_ids": jnp.asarray(inp["txt_ids"]),
        "txt_mask": jnp.asarray(inp["txt_mask"]),
        "hist_img": jnp.asarray(inp["hist_img"]),
        "hist_ang": jnp.asarray(inp["hist_ang"]),
        "hist_pano_img": jnp.asarray(inp["hist_pano_img"]),
        "hist_pano_ang": jnp.asarray(inp["hist_pano_ang"]),
        "hist_mask": jnp.asarray(inp["hist_mask"]),
        "itm_neg_idxs": jnp.asarray(neg_idxs),
        "itm_shuffled_pos": jnp.asarray(shuffled_pos),
    }

    def run(m):
        # mirror forward_itm up to the scores (loss uses logp[:, 0])
        txt = m.hamt.encode_text(batch["txt_ids"], batch["txt_mask"], True)
        b, t = batch["hist_img"].shape[:2]
        cls_tok = m.hamt.init_history(b, True)[:, None, :]
        base = m.hamt.encode_history_seq(
            batch["hist_img"], batch["hist_ang"],
            batch["hist_pano_img"], batch["hist_pano_ang"],
            pos_ids=None, deterministic=True)
        pos_ids = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None],
                                   (b, t))

        def with_pos(ids):
            steps = m.hamt.apply_hist_pos(base, ids, True)
            hist = jnp.concatenate([cls_tok, steps], axis=1)
            return m.hamt.run_h_layers(hist, batch["hist_mask"], True)

        pos_hist = with_pos(pos_ids)
        cand_hists = [pos_hist]
        cand_masks = [batch["hist_mask"]]
        for kk in range(batch["itm_neg_idxs"].shape[1]):
            cand_hists.append(pos_hist[batch["itm_neg_idxs"][:, kk]])
            cand_masks.append(batch["hist_mask"][batch["itm_neg_idxs"][:, kk]])
        for kk in range(batch["itm_shuffled_pos"].shape[0]):
            cand_hists.append(with_pos(batch["itm_shuffled_pos"][kk]))
            cand_masks.append(batch["hist_mask"])
        n_cand = len(cand_hists)
        all_hist = jnp.concatenate(cand_hists, axis=0)
        all_mask = jnp.concatenate(cand_masks, axis=0)
        txt_rep = jnp.tile(txt, (n_cand, 1, 1))
        txt_mask_rep = jnp.tile(batch["txt_mask"], (n_cand, 1))
        txt_out, hist_out = m.hamt.fuse(txt_rep, txt_mask_rep, all_hist,
                                        all_mask, True)
        fused = txt_out[:, 0] * hist_out[:, 0]
        scores = m.itm_head(fused)
        return scores.reshape(n_cand, b).T

    got = np.asarray(model.apply({"params": params}, method=run))
    np.testing.assert_allclose(got, want, atol=2e-4)
