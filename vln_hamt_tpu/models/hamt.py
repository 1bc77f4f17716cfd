"""HAMT — History Aware Multimodal Transformer (flax).

A from-scratch TPU-native reimplementation of the reference NavCMT
(``finetune_src/models/vilmodel_cmt.py:610-728``) and its wrapper
``VLNBertCMT`` / ``Critic`` (``finetune_src/models/model_HAMT.py``).
The reference's three string-dispatched forward modes become three
explicit methods designed to be jitted with fixed shapes:

- :meth:`encode_text`     — once per episode (mode='language')
- :meth:`encode_history`  — one history token per step (mode='history')
- :meth:`plan`            — cross-modal step -> action logits + state
                            (mode='visual'); history arrives as a fixed
                            (B, T_max+1, D) cache with a length mask
                            instead of a growing Python list.

Feature dropout (the wrapper's ``drop_env``, model_HAMT.py:18,34-36,51)
is applied inside :meth:`encode_history` / :meth:`plan`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import ModelConfig
from .layers import CrossModalLayer, TransformerStack, extend_mask


def _dtype_of(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class TextEmbeddings(nn.Module):
    """word + position + token-type embeddings (vilmodel_cmt.py:39-68).

    The token-type table is shared with observation embeddings (obs
    tokens use type id 1, vilmodel_cmt.py:681-684), hence the separate
    :meth:`token_type` accessor.
    """

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dtype = _dtype_of(cfg)
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        dtype=dtype, param_dtype=jnp.float32)
        self.position_embeddings = nn.Embed(cfg.max_position_embeddings,
                                            cfg.hidden_size, dtype=dtype,
                                            param_dtype=jnp.float32)
        self.token_type_embeddings = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                                              dtype=dtype, param_dtype=jnp.float32)
        self.LayerNorm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                                      param_dtype=jnp.float32)
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def token_type(self, type_ids: jnp.ndarray) -> jnp.ndarray:
        return self.token_type_embeddings(type_ids)

    def __call__(self, txt_ids: jnp.ndarray, deterministic: bool = True):
        l = txt_ids.shape[1]
        pos_ids = jnp.arange(l, dtype=jnp.int32)[None, :]
        emb = (
            self.word_embeddings(txt_ids)
            + self.position_embeddings(pos_ids)
            + self.token_type_embeddings(jnp.zeros_like(txt_ids))
        )
        emb = self.LayerNorm(emb)
        return self.dropout(emb, deterministic=deterministic)


class HAMT(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        dtype = _dtype_of(cfg)
        self._dtype = dtype

        self.embeddings = TextEmbeddings(cfg)
        self.lang_layers = TransformerStack(cfg, cfg.num_l_layers, dtype)
        self.x_layers = [CrossModalLayer(cfg, dtype, name=f"x_layer_{i}")
                         for i in range(cfg.num_x_layers)]
        self.h_layers = (
            TransformerStack(cfg, cfg.num_h_layers, dtype)
            if cfg.num_h_layers > 0 else None
        )
        self.r_layers = (
            TransformerStack(cfg, cfg.num_r_layers, dtype)
            if cfg.num_r_layers > 0 else None
        )

        dense = lambda: nn.Dense(cfg.hidden_size, dtype=dtype, param_dtype=jnp.float32)
        ln = lambda: nn.LayerNorm(epsilon=1e-12, dtype=dtype, param_dtype=jnp.float32)

        # observation (image) embeddings (vilmodel_cmt.py:498-521)
        self.ob_img_linear = dense()
        self.ob_img_ln = ln()
        self.ob_ang_linear = dense()
        self.ob_ang_ln = ln()
        self.ob_nav_type_embedding = nn.Embed(3, cfg.hidden_size, dtype=dtype,
                                              param_dtype=jnp.float32)
        self.ob_ln = ln()

        # history embeddings (vilmodel_cmt.py:523-594)
        self.hist_cls = self.param(
            "hist_cls", nn.initializers.zeros, (1, cfg.hidden_size), jnp.float32
        )
        self.hist_img_linear = dense()
        self.hist_img_ln = ln()
        self.hist_ang_linear = dense()
        self.hist_ang_ln = ln()
        self.hist_pos_embedding = nn.Embed(cfg.max_action_steps, cfg.hidden_size,
                                           dtype=dtype, param_dtype=jnp.float32)
        self.hist_type_embedding = nn.Embed(1, cfg.hidden_size, dtype=dtype,
                                            param_dtype=jnp.float32)
        self.hist_ln = ln()
        if cfg.hist_enc_pano:
            self.hist_pano_img_linear = dense()
            self.hist_pano_img_ln = ln()
            self.hist_pano_ang_linear = dense()
            self.hist_pano_ang_ln = ln()
            self.pano_encoder = TransformerStack(cfg, cfg.num_h_pano_layers, dtype)

        # action head (vilmodel_cmt.py:597-607)
        self.act_dense1 = dense()
        self.act_ln = ln()
        self.act_dense2 = nn.Dense(1, dtype=dtype, param_dtype=jnp.float32)

        # REVERIE object grounding (reverie/vlnbert_navref.py:12-56)
        if cfg.obj_feat_size > 0:
            self.obj_img_linear = dense()
            self.obj_img_ln = ln()
            self.obj_ang_linear = dense()
            self.obj_ang_ln = ln()
            self.obj_pos_linear = dense()
            self.obj_pos_ln = ln()
            self.obj_ln = ln()
            self.ref_dense1 = dense()
            self.ref_ln = ln()
            self.ref_dense2 = nn.Dense(1, dtype=dtype, param_dtype=jnp.float32)

        self.hidden_dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.feat_drop = nn.Dropout(cfg.feat_dropout)
        self.head_dropout = nn.Dropout(cfg.pred_head_dropout_prob)

    # ------------------------------------------------------------------
    def encode_text(self, txt_ids: jnp.ndarray, txt_mask: jnp.ndarray,
                    deterministic: bool = True) -> jnp.ndarray:
        """mode='language' (vilmodel_cmt.py:632-653).

        Returns (B, L, D), or (X+1, B, L, D) stacked per-x-layer language
        states when ``no_lang_ca`` (precomputed lang stream).
        """
        cfg = self.config
        ext = extend_mask(txt_mask, self._dtype)
        x = self.embeddings(txt_ids, deterministic=deterministic)
        x = self.lang_layers(x, ext, deterministic=deterministic)
        if cfg.fix_lang_embedding or not cfg.update_lang_bert:
            x = jax.lax.stop_gradient(x)
        if cfg.no_lang_ca:
            all_states = [x]
            for layer in self.x_layers:
                x = layer.lang_only(x, ext, deterministic=deterministic)
                all_states.append(x)
            return jnp.stack(all_states, axis=0)
        return x

    # ------------------------------------------------------------------
    def init_history(self, batch_size: int, deterministic: bool = True) -> jnp.ndarray:
        """The global [CLS] history token (vilmodel_cmt.py:569-572)."""
        type_emb = self.hist_type_embedding(jnp.zeros((batch_size,), jnp.int32))
        cls = self.hist_cls.astype(self._dtype) + type_emb
        cls = self.hist_ln(cls)
        out = self.hidden_dropout(cls, deterministic=deterministic)
        if self.config.fix_hist_embedding:
            out = jax.lax.stop_gradient(out)
        return out

    def encode_history(
        self,
        hist_img: jnp.ndarray,  # (B, D_img) current-view feature
        hist_ang: jnp.ndarray,  # (B, A) chosen-action angle feature
        step: jnp.ndarray,  # scalar or (B,) int32 step id
        pano_img: Optional[jnp.ndarray] = None,  # (B, V, D_img)
        pano_ang: Optional[jnp.ndarray] = None,  # (B, V, A)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """One per-step history token (vilmodel_cmt.py:574-594)."""
        cfg = self.config
        hist_img = self.feat_drop(hist_img, deterministic=deterministic)
        step = jnp.broadcast_to(jnp.asarray(step, jnp.int32), hist_img.shape[:1])
        type_emb = self.hist_type_embedding(jnp.zeros_like(step))
        emb = (
            self.hist_img_ln(self.hist_img_linear(hist_img))
            + self.hist_ang_ln(self.hist_ang_linear(hist_ang))
            + self.hist_pos_embedding(step)
            + type_emb
        )
        if cfg.hist_enc_pano:
            pano_img = self.feat_drop(pano_img, deterministic=deterministic)
            pano = (
                self.hist_pano_img_ln(self.hist_pano_img_linear(pano_img))
                + self.hist_pano_ang_ln(self.hist_pano_ang_linear(pano_ang))
            )
            pano = self.hidden_dropout(pano, deterministic=deterministic)
            # reference passes an all-zeros additive mask (attend all 36)
            pano = self.pano_encoder(pano, None, deterministic=deterministic)
            emb = emb + jnp.mean(pano, axis=1)
        emb = self.hist_ln(emb)
        out = self.hidden_dropout(emb, deterministic=deterministic)
        if cfg.fix_hist_embedding:
            out = jax.lax.stop_gradient(out)
        return out

    def encode_history_seq(
        self,
        hist_img: jnp.ndarray,  # (B, T, D_img)
        hist_ang: jnp.ndarray,  # (B, T, A)
        pano_img: Optional[jnp.ndarray] = None,  # (B, T, V, D_img)
        pano_ang: Optional[jnp.ndarray] = None,
        pos_ids: Optional[jnp.ndarray] = None,  # (B, T) or (1, T); None = no pos
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Full-sequence history embedding for pretraining
        (pretrain vilmodel.py HistoryEmbeddings.forward, :540-575).

        With ``pos_ids=None`` returns the position-free base embedding
        (used by ITM's shuffled-order negatives); apply positions with
        :meth:`apply_hist_pos`. Shares all parameters with the per-step
        :meth:`encode_history`.
        """
        cfg = self.config
        b, t = hist_img.shape[:2]
        hist_img = self.feat_drop(hist_img, deterministic=deterministic)
        type_emb = self.hist_type_embedding(jnp.zeros((b, t), jnp.int32))
        emb = (
            self.hist_img_ln(self.hist_img_linear(hist_img))
            + self.hist_ang_ln(self.hist_ang_linear(hist_ang))
            + type_emb
        )
        if cfg.hist_enc_pano and pano_img is not None:
            pano_img = self.feat_drop(pano_img, deterministic=deterministic)
            pano = (
                self.hist_pano_img_ln(self.hist_pano_img_linear(pano_img))
                + self.hist_pano_ang_ln(self.hist_pano_ang_linear(pano_ang))
            )
            v = pano.shape[2]
            pano = pano.reshape(b * t, v, -1)
            pano = self.pano_encoder(pano, None, deterministic=deterministic)
            emb = emb + jnp.mean(pano.reshape(b, t, v, -1), axis=2)
        if pos_ids is None:
            return emb
        return self.apply_hist_pos(emb, pos_ids, deterministic)

    def apply_hist_pos(self, base_emb: jnp.ndarray, pos_ids: jnp.ndarray,
                       deterministic: bool = True) -> jnp.ndarray:
        """position + LN + dropout on a position-free history embedding
        (pretrain vilmodel.py:568-571, reused for ITM shuffles :702-704)."""
        emb = self.hist_ln(base_emb + self.hist_pos_embedding(pos_ids))
        return self.hidden_dropout(emb, deterministic=deterministic)

    def run_h_layers(self, hist_tokens, hist_mask, deterministic: bool = True):
        if self.h_layers is None:
            return hist_tokens
        return self.h_layers(hist_tokens, extend_mask(hist_mask, self._dtype),
                             deterministic=deterministic)

    def fuse(
        self,
        txt_embeds: jnp.ndarray,  # (B, L, D) or (X+1, B, L, D) if no_lang_ca
        txt_mask: jnp.ndarray,
        visn: jnp.ndarray,  # (B, M, D) already-embedded visual stream
        visn_mask: jnp.ndarray,  # (B, M) bool
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Cross-modal x-layer stack over an arbitrary visual stream
        (pretrain path: LxmertEncoder.forward, vilmodel.py:486-494)."""
        cfg = self.config
        ext_txt = extend_mask(txt_mask, self._dtype)
        ext_visn = extend_mask(visn_mask, self._dtype)
        lang = txt_embeds[0] if cfg.no_lang_ca else txt_embeds
        for li, layer in enumerate(self.x_layers):
            if cfg.no_lang_ca:
                lang = txt_embeds[li]
            lang, visn = layer(lang, ext_txt, visn, ext_visn,
                               deterministic=deterministic)
        return lang, visn

    def embed_obs(self, ob_img, ob_ang, ob_nav, deterministic: bool = True):
        """Public obs embedding (pretrain needs it standalone)."""
        return self._embed_obs(ob_img, ob_ang, ob_nav, deterministic)

    # ------------------------------------------------------------------
    def _embed_obs(self, ob_img, ob_ang, ob_nav, deterministic):
        """ImageEmbeddings (vilmodel_cmt.py:498-521): obs token type = 1."""
        ob_img = self.feat_drop(ob_img, deterministic=deterministic)
        type_ids = jnp.ones(ob_img.shape[:2], jnp.int32)
        type_emb = self.embeddings.token_type(type_ids)
        emb = (
            self.ob_img_ln(self.ob_img_linear(ob_img))
            + self.ob_ang_ln(self.ob_ang_linear(ob_ang))
            + type_emb
            + self.ob_nav_type_embedding(ob_nav)
        )
        emb = self.ob_ln(emb)
        return self.hidden_dropout(emb, deterministic=deterministic)

    def plan(
        self,
        txt_embeds: jnp.ndarray,  # (B, L, D) or (X+1, B, L, D) if no_lang_ca
        txt_mask: jnp.ndarray,  # (B, L) bool
        hist_tokens: jnp.ndarray,  # (B, H, D) fixed-size history cache
        hist_mask: jnp.ndarray,  # (B, H) bool
        ob_img: jnp.ndarray,  # (B, N, D_img)
        ob_ang: jnp.ndarray,  # (B, N, A)
        ob_nav: jnp.ndarray,  # (B, N) int32
        ob_mask: jnp.ndarray,  # (B, N) bool
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """mode='visual' (vilmodel_cmt.py:663-728): one planning step.

        Returns (act_logits (B, N), state (B, D)). Invalid actions
        (nav type 0) get -inf logits; state is txt[CLS] * hist[CLS]
        (model_HAMT.py:63) or hist[CLS] under no_lang_ca.
        """
        cfg = self.config
        ext_hist = extend_mask(hist_mask, self._dtype)
        ext_ob = extend_mask(ob_mask, self._dtype)
        ext_txt = extend_mask(txt_mask, self._dtype)

        hist = hist_tokens
        if self.h_layers is not None:
            hist = self.h_layers(hist, ext_hist, deterministic=deterministic)

        ob = self._embed_obs(ob_img, ob_ang, ob_nav, deterministic)
        if self.r_layers is not None:
            ob = self.r_layers(ob, ext_ob, deterministic=deterministic)
        if cfg.fix_obs_embedding:
            ob = jax.lax.stop_gradient(ob)

        h = hist_tokens.shape[1]
        visn = jnp.concatenate([hist, ob], axis=1)
        visn_mask = jnp.concatenate([ext_hist, ext_ob], axis=-1)

        if cfg.no_lang_ca:
            lang = txt_embeds[0]
        else:
            lang = txt_embeds
        for li, layer in enumerate(self.x_layers):
            if cfg.no_lang_ca:
                lang = txt_embeds[li]
            lang, visn = layer(lang, ext_txt, visn, visn_mask,
                               deterministic=deterministic)

        hist_out = visn[:, :h]
        ob_out = visn[:, h:]

        # action head (vilmodel_cmt.py:714-726)
        if cfg.no_lang_ca:
            head_in = ob_out
        elif cfg.act_pred_token == "ob_txt":
            head_in = ob_out * lang[:, :1]
        elif cfg.act_pred_token == "ob":
            head_in = ob_out
        elif cfg.act_pred_token == "ob_hist":
            head_in = ob_out * hist_out[:, :1]
        elif cfg.act_pred_token == "ob_txt_hist":
            head_in = ob_out * (lang[:, :1] + hist_out[:, :1])
        else:
            raise ValueError(f"bad act_pred_token {cfg.act_pred_token!r}")

        x = nn.relu(self.act_dense1(head_in))
        x = self.act_ln(x)
        x = self.head_dropout(x, deterministic=deterministic)
        logits = self.act_dense2(x).squeeze(-1).astype(jnp.float32)
        logits = jnp.where(ob_nav == 0, -jnp.inf, logits)

        if cfg.no_lang_ca:
            state = hist_out[:, 0]
        else:
            state = lang[:, 0] * hist_out[:, 0]
        return logits, state.astype(jnp.float32)

    # ------------------------------------------------------------------
    def _embed_objects(self, obj_fts, obj_angs, obj_pos, deterministic):
        """ObjectEmbeddings (reverie/vlnbert_navref.py:31-42): objects
        carry token type 1 (visual) and nav type 2 (stop-like)."""
        b, k = obj_fts.shape[:2]
        obj_fts = self.feat_drop(obj_fts, deterministic=deterministic)
        type_emb = self.embeddings.token_type(jnp.ones((b, k), jnp.int32))
        nav_emb = self.ob_nav_type_embedding(jnp.full((b, k), 2, jnp.int32))
        emb = (
            self.obj_img_ln(self.obj_img_linear(obj_fts))
            + self.obj_ang_ln(self.obj_ang_linear(obj_angs))
            + self.obj_pos_ln(self.obj_pos_linear(obj_pos))
            + nav_emb
            + type_emb
        )
        emb = self.obj_ln(emb)
        return self.hidden_dropout(emb, deterministic=deterministic)

    def plan_ref(
        self,
        txt_embeds, txt_mask, hist_tokens, hist_mask,
        ob_img, ob_ang, ob_nav, ob_mask,
        obj_fts, obj_angs, obj_pos, obj_mask,
        deterministic: bool = True,
    ):
        """REVERIE planning step (reverie/vlnbert_navref.py:90-158):
        cross-modal over [hist; obs; objects]; action head over obs
        tokens (ob * hist[CLS]), object head over object tokens
        (obj * txt[CLS]).

        Returns (act_logits (B, N), obj_logits (B, K), state (B, D)).
        The caller appends the max object logit as the STOP action
        (reverie/agent.py:251-254).
        """
        cfg = self.config
        ext_hist = extend_mask(hist_mask, self._dtype)
        ext_ob = extend_mask(ob_mask, self._dtype)
        ext_obj = extend_mask(obj_mask, self._dtype)
        ext_txt = extend_mask(txt_mask, self._dtype)

        hist = hist_tokens
        if self.h_layers is not None:
            hist = self.h_layers(hist, ext_hist, deterministic=deterministic)
        ob = self._embed_obs(ob_img, ob_ang, ob_nav, deterministic)
        if self.r_layers is not None:
            ob = self.r_layers(ob, ext_ob, deterministic=deterministic)
        obj = self._embed_objects(obj_fts, obj_angs, obj_pos, deterministic)

        h, n = hist.shape[1], ob.shape[1]
        visn = jnp.concatenate([hist, ob, obj], axis=1)
        visn_mask = jnp.concatenate([ext_hist, ext_ob, ext_obj], axis=-1)

        # NavRefCMT has NO per-layer lang states: under no_lang_ca its
        # 'language' mode returns the plain encoding
        # (reverie/vlnbert_navref.py:69-84 — no precompute loop, unlike
        # vilmodel_cmt.py:645-652) and the x-layers pass the text stream
        # through UNCHANGED (LXRTXLayer lang passthrough), so every
        # layer — and the ref_object head (:156) — sees the INITIAL
        # text encoding. txt_embeds still arrives stacked (X+1,B,L,D)
        # from the shared encode_text; only index 0 is meaningful here.
        lang = txt_embeds[0] if cfg.no_lang_ca else txt_embeds
        for layer in self.x_layers:
            lang, visn = layer(lang, ext_txt, visn, visn_mask,
                               deterministic=deterministic)

        hist_out = visn[:, :h]
        ob_out = visn[:, h : h + n]
        obj_out = visn[:, h + n :]

        x = nn.relu(self.act_dense1(ob_out * hist_out[:, :1]))
        x = self.act_ln(x)
        x = self.head_dropout(x, deterministic=deterministic)
        act_logits = self.act_dense2(x).squeeze(-1).astype(jnp.float32)
        act_logits = jnp.where(ob_nav == 0, -jnp.inf, act_logits)

        r = nn.relu(self.ref_dense1(obj_out * lang[:, :1]))
        r = self.ref_ln(r)
        r = self.head_dropout(r, deterministic=deterministic)
        obj_logits = self.ref_dense2(r).squeeze(-1).astype(jnp.float32)
        obj_logits = jnp.where(obj_mask, obj_logits, -jnp.inf)

        if cfg.no_lang_ca:
            state = hist_out[:, 0]
        else:
            state = lang[:, 0] * hist_out[:, 0]
        return act_logits, obj_logits, state.astype(jnp.float32)

    # ------------------------------------------------------------------
    def __call__(self, txt_ids, txt_mask, hist_tokens, hist_mask,
                 ob_img, ob_ang, ob_nav, ob_mask,
                 hist_img, hist_ang, pano_img, pano_ang,
                 deterministic: bool = True):
        """Init-only forward touching every submodule."""
        cfg = self.config
        txt = self.encode_text(txt_ids, txt_mask, deterministic)
        _ = self.init_history(txt_ids.shape[0], deterministic)
        _ = self.encode_history(hist_img, hist_ang, 0, pano_img, pano_ang,
                                deterministic)
        if cfg.obj_feat_size > 0:
            b = txt_ids.shape[0]
            k = 2
            _ = self.plan_ref(
                txt, txt_mask, hist_tokens, hist_mask,
                ob_img, ob_ang, ob_nav, ob_mask,
                jnp.zeros((b, k, cfg.obj_feat_size)),
                jnp.zeros((b, k, cfg.angle_feat_size)),
                jnp.zeros((b, k, cfg.obj_loc_size)),
                jnp.ones((b, k), bool),
                deterministic,
            )
        return self.plan(txt, txt_mask, hist_tokens, hist_mask,
                         ob_img, ob_ang, ob_nav, ob_mask, deterministic)


class Critic(nn.Module):
    """768 -> 512 -> 1 value head (model_HAMT.py:258-269)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, state: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        dtype = _dtype_of(cfg)
        x = nn.Dense(512, dtype=dtype, param_dtype=jnp.float32)(state)
        x = nn.relu(x)
        x = nn.Dropout(cfg.critic_dropout)(x, deterministic=deterministic)
        v = nn.Dense(1, dtype=dtype, param_dtype=jnp.float32)(x)
        return v.squeeze(-1).astype(jnp.float32)


def init_hamt_params(cfg: ModelConfig, rng: jax.Array, views: int = 36,
                     num_ob_tokens: int = 51, instr_len: int = 8,
                     hist_len: int = 4):
    """Initialize HAMT + Critic parameter trees with dummy shapes."""
    model = HAMT(cfg)
    critic = Critic(cfg)
    b = 2
    k1, k2, k3 = jax.random.split(rng, 3)
    dummy = dict(
        txt_ids=jnp.zeros((b, instr_len), jnp.int32),
        txt_mask=jnp.ones((b, instr_len), bool),
        hist_tokens=jnp.zeros((b, hist_len, cfg.hidden_size), jnp.float32),
        hist_mask=jnp.ones((b, hist_len), bool),
        ob_img=jnp.zeros((b, num_ob_tokens, cfg.image_feat_size), jnp.float32),
        ob_ang=jnp.zeros((b, num_ob_tokens, cfg.angle_feat_size), jnp.float32),
        ob_nav=jnp.ones((b, num_ob_tokens), jnp.int32),
        ob_mask=jnp.ones((b, num_ob_tokens), bool),
        hist_img=jnp.zeros((b, cfg.image_feat_size), jnp.float32),
        hist_ang=jnp.zeros((b, cfg.angle_feat_size), jnp.float32),
        pano_img=jnp.zeros((b, views, cfg.image_feat_size), jnp.float32),
        pano_ang=jnp.zeros((b, views, cfg.angle_feat_size), jnp.float32),
    )
    params = model.init({"params": k1, "dropout": k2}, **dummy)["params"]
    critic_params = critic.init(
        {"params": k3}, jnp.zeros((b, cfg.hidden_size), jnp.float32)
    )["params"]
    return model, critic, params, critic_params
