"""Proxy-task pretraining model: HAMT backbone + task heads.

Parity targets: ``pretrain_src/model/vilmodel.py`` (NavPreTrainedModel —
the single-shot forward over text / full padded history / optional obs)
and ``pretrain_src/model/pretrain_cmt.py`` (MultiStepNavCMTPreTraining —
per-task heads and losses). The backbone is the SAME flax HAMT module as
fine-tuning (parameters transfer 1:1; the reference achieves this with
checkpoint key remapping, ``finetune_src/models/vlnbert_init.py:20-31``).

Every forward is fixed-shape (histories padded to ``max_hist_len``,
observations to the 37-token pano layout), so one XLA program serves
every batch of a task. Losses are masked means computed in-graph.

ITM negatives: the reference samples in-batch negatives and shuffled
history orders inside the model with torch RNG (vilmodel.py:678-711).
Here the host passes the sampled indices/permutations in the batch
(``itm_neg_idxs`` (B, K1), ``itm_shuffled_pos`` (K2, B, T)), keeping the
jitted graph deterministic in its inputs.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import ModelConfig
from ..models.hamt import HAMT, _dtype_of
from ..models.layers import erf_gelu

IGNORE_ID = -100


class MLP2Head(nn.Module):
    """dense -> relu -> LN -> dropout -> dense(out) (pretrain_cmt.py:13-47)."""

    config: ModelConfig
    out_dim: int
    use_dropout: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        dtype = _dtype_of(cfg)
        h = nn.Dense(cfg.hidden_size, dtype=dtype, param_dtype=jnp.float32,
                     name="dense1")(x)
        h = nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-12, dtype=dtype, param_dtype=jnp.float32,
                         name="ln")(h)
        if self.use_dropout:
            h = nn.Dropout(cfg.pred_head_dropout_prob)(h, deterministic=deterministic)
        return nn.Dense(self.out_dim, dtype=dtype, param_dtype=jnp.float32,
                        name="dense2")(h)


class MLMHead(nn.Module):
    """BertLMPredictionHead with decoder tied to word embeddings
    (pretrain_cmt.py:96-99; vilmodel_cmt.py:269-285)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden, word_embed: nn.Embed):
        cfg = self.config
        dtype = _dtype_of(cfg)
        h = nn.Dense(cfg.hidden_size, dtype=dtype, param_dtype=jnp.float32,
                     name="transform_dense")(hidden)
        h = erf_gelu(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                         param_dtype=jnp.float32, name="transform_ln")(h)
        logits = word_embed.attend(h.astype(word_embed.embedding.dtype))
        bias = self.param("bias", nn.initializers.zeros, (cfg.vocab_size,),
                          jnp.float32)
        return logits.astype(jnp.float32) + bias


class HAMTPretrain(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.hamt = HAMT(cfg)
        self.mlm_head = MLMHead(cfg)
        self.next_action = MLP2Head(cfg, 1)
        self.regress_action = MLP2Head(cfg, 3)  # heading, elevation, progress
        self.sprel_head = MLP2Head(cfg, 2)
        self.image_classifier = MLP2Head(cfg, cfg.image_prob_size,
                                         use_dropout=False)
        self.itm_head = MLP2Head(cfg, 1, use_dropout=False)

    # ------------------------------------------------------------------
    def _encode(
        self,
        txt_ids, txt_mask,
        hist_img=None, hist_ang=None, hist_pano_img=None, hist_pano_ang=None,
        hist_mask=None,
        ob_img=None, ob_ang=None, ob_nav=None, ob_mask=None,
        deterministic: bool = True,
    ):
        """NavPreTrainedModel.forward (vilmodel.py:591-638): text through
        l_layers, [CLS]+history tokens, optional obs, x-layers over
        [hist; ob] vs text. ``hist_mask`` covers [CLS]+T tokens."""
        b = txt_ids.shape[0]
        txt = self.hamt.encode_text(txt_ids, txt_mask, deterministic)

        cls_tok = self.hamt.init_history(b, deterministic)[:, None, :]
        if hist_img is not None:
            t = hist_img.shape[1]
            pos_ids = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
            steps = self.hamt.encode_history_seq(
                hist_img, hist_ang, hist_pano_img, hist_pano_ang, pos_ids,
                deterministic,
            )
            hist = jnp.concatenate([cls_tok, steps], axis=1)
        else:
            hist = cls_tok
            hist_mask = jnp.ones((b, 1), bool)

        hist = self.hamt.run_h_layers(hist, hist_mask, deterministic)

        if ob_img is not None:
            ob = self.hamt.embed_obs(ob_img, ob_ang, ob_nav, deterministic)
            visn = jnp.concatenate([hist, ob], axis=1)
            visn_mask = jnp.concatenate([hist_mask, ob_mask], axis=1)
        else:
            ob = None
            visn, visn_mask = hist, hist_mask

        txt_out, visn_out = self.hamt.fuse(txt, txt_mask, visn, visn_mask,
                                           deterministic)
        h = hist.shape[1]
        hist_out = visn_out[:, :h]
        ob_out = visn_out[:, h:] if ob_img is not None else None
        return txt_out, hist_out, ob_out

    # ------------------------------------------------------------- MLM
    def forward_mlm(self, batch: Dict[str, jnp.ndarray],
                    deterministic: bool = False):
        """Masked LM (pretrain_cmt.py:142-159). txt_labels: IGNORE_ID at
        unmasked positions. Returns mean CE over masked tokens."""
        txt_out, _, _ = self._encode(
            batch["txt_ids"], batch["txt_mask"],
            batch.get("hist_img"), batch.get("hist_ang"),
            batch.get("hist_pano_img"), batch.get("hist_pano_ang"),
            batch.get("hist_mask"), deterministic=deterministic,
        )
        logits = self.mlm_head(txt_out, self.hamt.embeddings.word_embeddings)
        labels = batch["txt_labels"]
        valid = labels != IGNORE_ID
        if batch.get("ex_valid") is not None:
            # full-split validation: wrap-padded duplicate rows carry
            # ex_valid=False and must not count (trainer.validate)
            valid = valid & batch["ex_valid"][:, None]
        tgt = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1).squeeze(-1)
        loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(valid.sum(), 1)
        correct = (jnp.argmax(logits, -1) == labels) & valid
        acc = correct.sum() / jnp.maximum(valid.sum(), 1)
        return loss, {"acc": acc, "n": valid.sum()}

    # ------------------------------------------------------------- MRC
    def forward_mrc(self, batch, deterministic: bool = False):
        """Masked region classification vs ViT class-prob soft labels,
        KL loss over masked history steps (pretrain_cmt.py:224-243)."""
        _, hist_out, _ = self._encode(
            batch["txt_ids"], batch["txt_mask"],
            batch["hist_img"], batch["hist_ang"],
            batch.get("hist_pano_img"), batch.get("hist_pano_ang"),
            batch["hist_mask"], deterministic=deterministic,
        )
        step_out = hist_out[:, 1:]  # drop [CLS]
        logits = self.image_classifier(step_out, deterministic=deterministic)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        targets = batch["hist_img_probs"]  # (B, T, P) soft labels
        mask = batch["hist_mrc_masks"]  # (B, T) bool
        if batch.get("ex_valid") is not None:
            mask = mask & batch["ex_valid"][:, None]
        kl = jnp.sum(targets * (jnp.log(jnp.clip(targets, 1e-12)) - logp), -1)
        loss = jnp.sum(jnp.where(mask, kl, 0.0)) / jnp.maximum(mask.sum(), 1)
        acc = (
            (jnp.argmax(logits, -1) == jnp.argmax(targets, -1)) & mask
        ).sum() / jnp.maximum(mask.sum(), 1)
        return loss, {"acc": acc, "n": mask.sum()}

    # ------------------------------------------------------------- SAP
    def forward_sap(self, batch, deterministic: bool = False):
        """Single-step action prediction CE (pretrain_cmt.py:167-183)."""
        txt_out, _, ob_out = self._encode(
            batch["txt_ids"], batch["txt_mask"],
            batch.get("hist_img"), batch.get("hist_ang"),
            batch.get("hist_pano_img"), batch.get("hist_pano_ang"),
            batch.get("hist_mask"),
            batch["ob_img"], batch["ob_ang"], batch["ob_nav"], batch["ob_mask"],
            deterministic=deterministic,
        )
        scores = self.next_action(
            ob_out * txt_out[:, :1], deterministic=deterministic
        ).squeeze(-1).astype(jnp.float32)
        scores = jnp.where(batch["ob_nav"] == 0, -jnp.inf, scores)
        labels = batch["ob_action_viewindex"]
        logp = _masked_log_softmax(scores)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1).squeeze(-1)
        if batch.get("ex_valid") is not None:
            w = batch["ex_valid"].astype(jnp.float32)
            wn = jnp.maximum(w.sum(), 1.0)
            loss = jnp.sum(nll * w) / wn
            acc = jnp.sum((jnp.argmax(scores, -1) == labels) * w) / wn
            return loss, {"acc": acc, "n": w.sum()}
        loss = jnp.mean(nll)
        acc = jnp.mean(jnp.argmax(scores, -1) == labels)
        return loss, {"acc": acc, "n": labels.shape[0]}

    # ------------------------------------------------------------- SAR
    def forward_sar(self, batch, deterministic: bool = False):
        """Action angle + progress regression from txt [CLS]
        (pretrain_cmt.py:185-200), MSE."""
        txt_out, _, _ = self._encode(
            batch["txt_ids"], batch["txt_mask"],
            batch.get("hist_img"), batch.get("hist_ang"),
            batch.get("hist_pano_img"), batch.get("hist_pano_ang"),
            batch.get("hist_mask"),
            batch["ob_img"], batch["ob_ang"], batch["ob_nav"], batch["ob_mask"],
            deterministic=deterministic,
        )
        pred = self.regress_action(txt_out[:, 0], deterministic=deterministic)
        target = jnp.concatenate(
            [batch["ob_action_angles"], batch["ob_progress"][:, None]], axis=1
        )
        sq = (pred.astype(jnp.float32) - target) ** 2
        if batch.get("ex_valid") is not None:
            w = batch["ex_valid"].astype(jnp.float32)
            wn = jnp.maximum(w.sum(), 1.0)
            per_dim = jnp.sum(sq * w[:, None], axis=0) / wn
            return jnp.mean(per_dim), {
                "heading_loss": per_dim[0], "elevation_loss": per_dim[1],
                "progress_loss": per_dim[2], "n": w.sum()}
        loss = jnp.mean(sq)
        # per-component validator metrics (main_r2r.py:398-428)
        per_dim = jnp.mean(sq, axis=0)
        return loss, {"heading_loss": per_dim[0],
                      "elevation_loss": per_dim[1],
                      "progress_loss": per_dim[2], "n": pred.shape[0]}

    # ----------------------------------------------------------- SpRel
    def forward_sprel(self, batch, deterministic: bool = False):
        """Anchor-view relative heading/elevation regression
        (pretrain_cmt.py:202-222). Obs must be the raw 36+STOP pano
        layout; predictions are for the 36 views vs the anchor."""
        _, _, ob_out = self._encode(
            batch["txt_ids"], batch["txt_mask"],
            batch.get("hist_img"), batch.get("hist_ang"),
            batch.get("hist_pano_img"), batch.get("hist_pano_ang"),
            batch.get("hist_mask"),
            batch["ob_img"], batch["ob_ang"], batch["ob_nav"], batch["ob_mask"],
            deterministic=deterministic,
        )
        anchor = jnp.take_along_axis(
            ob_out, batch["sp_anchor_idxs"][:, None, None], axis=1
        )  # (B, 1, D)
        views = ob_out[:, :-1]  # drop STOP
        cat = jnp.concatenate(
            [jnp.broadcast_to(anchor, views.shape), views], axis=-1
        )
        pred = self.sprel_head(cat, deterministic=deterministic)
        sq = (pred.astype(jnp.float32) - batch["sp_targets"]) ** 2
        if batch.get("ex_valid") is not None:
            w = batch["ex_valid"].astype(jnp.float32)
            wn = jnp.maximum(w.sum(), 1.0) * sq.shape[1]
            per_dim = jnp.sum(sq * w[:, None, None], axis=(0, 1)) / wn
            return jnp.mean(per_dim), {
                "heading_loss": per_dim[0], "elevation_loss": per_dim[1],
                "n": w.sum()}
        loss = jnp.mean(sq)
        # per-component validator metrics (main_r2r.py:430-453)
        per_dim = jnp.mean(sq, axis=(0, 1))
        return loss, {"heading_loss": per_dim[0],
                      "elevation_loss": per_dim[1], "n": pred.shape[0]}

    # ------------------------------------------------------------- ITM
    def forward_itm(self, batch, deterministic: bool = False):
        """Instruction-trajectory matching (vilmodel.py:640-724 +
        pretrain_cmt.py:245-262): positive pair + K1 in-batch negative
        trajectories + K2 shuffled-order negatives; 1-of-(1+K) CE.
        """
        txt_ids, txt_mask = batch["txt_ids"], batch["txt_mask"]
        hist_mask = batch["hist_mask"]  # (B, 1+T)
        b, t = batch["hist_img"].shape[:2]

        txt = self.hamt.encode_text(txt_ids, txt_mask, deterministic)
        cls_tok = self.hamt.init_history(b, deterministic)[:, None, :]
        base = self.hamt.encode_history_seq(
            batch["hist_img"], batch["hist_ang"],
            batch.get("hist_pano_img"), batch.get("hist_pano_ang"),
            pos_ids=None, deterministic=deterministic,
        )
        pos_ids = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))

        def with_pos(ids):
            steps = self.hamt.apply_hist_pos(base, ids, deterministic)
            hist = jnp.concatenate([cls_tok, steps], axis=1)
            return self.hamt.run_h_layers(hist, hist_mask, deterministic)

        pos_hist = with_pos(pos_ids)

        cand_hists = [pos_hist]
        cand_masks = [hist_mask]
        neg_idxs = batch.get("itm_neg_idxs")  # (B, K1) in-batch negatives
        if neg_idxs is not None:
            for k in range(neg_idxs.shape[1]):
                cand_hists.append(pos_hist[neg_idxs[:, k]])
                cand_masks.append(hist_mask[neg_idxs[:, k]])
        shuffled = batch.get("itm_shuffled_pos")  # (K2, B, T)
        if shuffled is not None:
            for k in range(shuffled.shape[0]):
                cand_hists.append(with_pos(shuffled[k]))
                cand_masks.append(hist_mask)

        n_cand = len(cand_hists)
        all_hist = jnp.concatenate(cand_hists, axis=0)  # (n*B, 1+T, D)
        all_mask = jnp.concatenate(cand_masks, axis=0)
        txt_rep = jnp.tile(txt, (n_cand,) + (1,) * (txt.ndim - 1)) \
            if not self.config.no_lang_ca else jnp.tile(txt, (1, n_cand, 1, 1))
        txt_mask_rep = jnp.tile(txt_mask, (n_cand, 1))

        txt_out, hist_out = self.hamt.fuse(txt_rep, txt_mask_rep, all_hist,
                                           all_mask, deterministic)
        fused = txt_out[:, 0] * hist_out[:, 0]  # (n*B, D)
        scores = self.itm_head(fused, deterministic=deterministic)
        scores = scores.reshape(n_cand, b).T.astype(jnp.float32)  # (B, n)
        logp = jax.nn.log_softmax(scores, axis=-1)
        if batch.get("ex_valid") is not None:
            # padded rows still serve as in-batch NEGATIVES (real
            # content, just duplicated) — only their positive-row score
            # is excluded from the metrics
            w = batch["ex_valid"].astype(jnp.float32)
            wn = jnp.maximum(w.sum(), 1.0)
            loss = -jnp.sum(logp[:, 0] * w) / wn
            acc = jnp.sum((jnp.argmax(scores, -1) == 0) * w) / wn
            return loss, {"acc": acc, "n": w.sum()}
        loss = -jnp.mean(logp[:, 0])  # positive is always candidate 0
        acc = jnp.mean(jnp.argmax(scores, -1) == 0)
        return loss, {"acc": acc, "n": b}

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, jnp.ndarray], task: str,
                 deterministic: bool = False, feat_table=None):
        """Task dispatch (pretrain_cmt.py:101-140). ``task`` is static.

        With ``feat_table`` and an index-mode batch (``hist_node``
        present), the (H,36,D) feature stacks are gathered/expanded ON
        DEVICE from the resident table first — the host ships int32
        rows (see :func:`expand_index_batch`)."""
        if feat_table is not None and "hist_node" in batch:
            batch = expand_index_batch(batch, feat_table, self.config,
                                       hist_enc_pano=True)
        fwd = {
            "mlm": self.forward_mlm,
            "mrc": self.forward_mrc,
            "itm": self.forward_itm,
            "sap": self.forward_sap,
            "sar": self.forward_sar,
            "sprel": self.forward_sprel,
        }[task]
        return fwd(batch, deterministic=deterministic)

    def init_all(self, batch):
        """Init-only: touch every task head."""
        out = {}
        for task in ("mlm", "mrc", "itm", "sap", "sar", "sprel"):
            out[task] = self(batch, task, deterministic=True)[0]
        return out


def _masked_log_softmax(logits):
    from ..agents.losses import masked_log_softmax

    return masked_log_softmax(logits)


def expand_index_batch(batch: Dict[str, jnp.ndarray], feat_table,
                       cfg: ModelConfig,
                       hist_enc_pano: bool = True) -> Dict[str, jnp.ndarray]:
    """Index-mode pretrain batch -> feature-mode batch, on device.

    The pretrain twin of the fine-tune feature-table transport: the
    host ships int32 table rows (``hist_node (B,H)``, ``hist_view``,
    ``ob_node (B)``, ``ob_view``) plus the tiny angle/label/mask
    arrays; this gathers the (B,H,36,Dfull) stacks from the resident
    ``feat_table`` (N, 36, image_feat+prob) and reproduces the host
    assembly exactly (``TrajectoryDataset.history_arrays`` /
    ``ob_pano_arrays`` + the batcher's MRC input-masking and
    visual/angle kills): padded steps zeroed, MRC-masked step features
    zeroed (labels = softmax of the prob tail, r2r_data.py:317-329),
    STOP token appended, kills applied. Cuts per-batch H2D from ~50 MB
    (bs16) to KBs.
    """
    from ..data.angle import all_point_angle_feature

    b = dict(batch)
    d = cfg.image_feat_size
    ang_tab = jnp.asarray(
        all_point_angle_feature(cfg.angle_feat_size), feat_table.dtype)

    hn = b.pop("hist_node")  # (B, H) global table rows
    hv = b.pop("hist_view")  # (B, H)
    h = hn.shape[1]
    live = jnp.arange(h)[None, :] < b["hist_len"][:, None]  # (B, H)
    rows = feat_table[hn]  # (B, H, 36, Dfull)
    sel = jnp.take_along_axis(
        rows, hv[:, :, None, None], axis=2)[:, :, 0]  # (B, H, Dfull)
    hist_img = jnp.where(live[..., None], sel[..., :d], 0)
    mrc = b.get("hist_mrc_masks")
    if mrc is not None:
        # input-side masking (r2r_tasks.py:138-146) + soft prob labels
        hist_img = jnp.where(mrc[..., None], 0, hist_img)
        logits = sel[..., d: d + cfg.image_prob_size].astype(jnp.float32)
        b["hist_img_probs"] = jnp.where(
            live[..., None], jax.nn.softmax(logits, axis=-1), 0.0)
    b["hist_img"] = hist_img
    if hist_enc_pano:
        pano = jnp.where(live[..., None, None], rows[..., :d], 0)
        if mrc is not None:
            pano = jnp.where(mrc[..., None, None], 0, pano)
        b["hist_pano_img"] = pano
        b["hist_pano_ang"] = jnp.where(live[..., None, None],
                                       ang_tab[hv], 0)

    if "ob_node" in b:
        on = b.pop("ob_node")  # (B,)
        n_b = on.shape[0]
        views = feat_table[on][..., :d]  # (B, 36, D)
        stop = jnp.zeros((n_b, 1, d), views.dtype)
        if "ob_perm" in b:
            # candidate-first layout (ob_cand_arrays): gather the 37
            # [views | zero] rows by the host permutation; angles,
            # nav types and masks ship from the host (the candidate
            # slots' exact edge angles aren't table lookups)
            perm = b.pop("ob_perm")  # (B, W) in [0, 36]
            padded = jnp.concatenate([views, stop], axis=1)
            ob_img = jnp.take_along_axis(padded, perm[..., None], axis=1)
            ob_ang = b["ob_ang"].astype(ang_tab.dtype)
        else:
            ov = b.pop("ob_view")
            ob_img = jnp.concatenate([views, stop], axis=1)
            ob_ang = jnp.concatenate(
                [ang_tab[ov],
                 jnp.zeros((n_b, 1, cfg.angle_feat_size), ang_tab.dtype)],
                axis=1)
            b["ob_mask"] = jnp.ones((n_b, ob_img.shape[1]), bool)
        kv, ka = b.pop("ob_kill_v"), b.pop("ob_kill_a")
        ob_img = jnp.where(kv[:, None, None], 0, ob_img)
        ob_ang = jnp.where(ka[:, None, None], 0, ob_ang)
        b["ob_img"] = ob_img
        b["ob_ang"] = ob_ang
    return b


def init_pretrain_params(cfg: ModelConfig, rng: jax.Array, views: int = 36,
                         max_hist_len: int = 8, instr_len: int = 8):
    """Initialize by running every task head once on dummy data."""
    import numpy as np

    model = HAMTPretrain(cfg)
    b = 2
    n_ob = views + 1
    dummy = {
        "txt_ids": jnp.zeros((b, instr_len), jnp.int32),
        "txt_mask": jnp.ones((b, instr_len), bool),
        "txt_labels": jnp.full((b, instr_len), IGNORE_ID, jnp.int32),
        "hist_img": jnp.zeros((b, max_hist_len, cfg.image_feat_size)),
        "hist_ang": jnp.zeros((b, max_hist_len, cfg.angle_feat_size)),
        "hist_pano_img": jnp.zeros((b, max_hist_len, views, cfg.image_feat_size)),
        "hist_pano_ang": jnp.zeros((b, max_hist_len, views, cfg.angle_feat_size)),
        "hist_mask": jnp.ones((b, max_hist_len + 1), bool),
        "hist_img_probs": jnp.ones((b, max_hist_len, cfg.image_prob_size))
        / cfg.image_prob_size,
        "hist_mrc_masks": jnp.ones((b, max_hist_len), bool),
        "ob_img": jnp.zeros((b, n_ob, cfg.image_feat_size)),
        "ob_ang": jnp.zeros((b, n_ob, cfg.angle_feat_size)),
        "ob_nav": jnp.ones((b, n_ob), jnp.int32),
        "ob_mask": jnp.ones((b, n_ob), bool),
        "ob_action_viewindex": jnp.zeros((b,), jnp.int32),
        "ob_action_angles": jnp.zeros((b, 2)),
        "ob_progress": jnp.zeros((b,)),
        "sp_anchor_idxs": jnp.zeros((b,), jnp.int32),
        "sp_targets": jnp.zeros((b, views, 2)),
        "itm_neg_idxs": jnp.zeros((b, 1), jnp.int32),
        "itm_shuffled_pos": jnp.zeros((1, b, max_hist_len), jnp.int32),
    }

    k1, k2 = jax.random.split(rng)
    variables = model.init({"params": k1, "dropout": k2}, dummy,
                           method=HAMTPretrain.init_all)
    return model, variables["params"]
