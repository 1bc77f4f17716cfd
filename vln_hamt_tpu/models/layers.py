"""Transformer building blocks (flax.linen).

Numerical parity targets with the reference BERT/LXMERT blocks
(``finetune_src/models/vilmodel_cmt.py``):
- erf-based GELU (vilmodel_cmt.py:22-28), NOT the tanh approximation
- LayerNorm eps 1e-12
- additive attention masks of ``(1 - mask) * -10000`` (vilmodel_cmt.py:
  634-636) rather than -inf fills, so converted checkpoints reproduce
  reference logits
- post-LN residual blocks (BertSelfOutput / BertOutput)

All modules take ``dtype`` for activation precision (bfloat16 on TPU)
while parameters stay float32 (``param_dtype``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import ModelConfig

Dtype = Any


def erf_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * 0.5 * (1 + erf(x / sqrt(2))) — parity vilmodel_cmt.py:22-28."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


ACT2FN = {"gelu": erf_gelu, "relu": nn.relu, "swish": nn.swish}


def extend_mask(mask: jnp.ndarray, dtype: Dtype) -> jnp.ndarray:
    """(B, L) bool/int -> (B, 1, 1, L) additive mask with -10000 at pads."""
    m = mask.astype(dtype)
    return ((1.0 - m) * -10000.0)[:, None, None, :]


class MultiHeadAttention(nn.Module):
    """Q from `hidden`, K/V from `context` (self-attn when identical).

    Covers BertSelfAttention (vilmodel_cmt.py:71-129) and BertOutAttention
    (297-348); the reference's separate classes are the same math.
    """

    config: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,  # (B, Lq, D)
        context: jnp.ndarray,  # (B, Lk, D)
        attn_mask: Optional[jnp.ndarray] = None,  # (B, 1, 1, Lk) additive
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        h, hd = cfg.num_attention_heads, cfg.head_dim
        dense = lambda name: nn.Dense(
            h * hd, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("query")(hidden).reshape(*hidden.shape[:-1], h, hd)
        k = dense("key")(context).reshape(*context.shape[:-1], h, hd)
        v = dense("value")(context).reshape(*context.shape[:-1], h, hd)

        # Pallas fused path: VMEM-resident QK^T->mask->softmax->V in one
        # kernel (ops/attention.py). Attention-prob dropout runs inside
        # the kernel (counter-based, seeded from this module's flax
        # 'dropout' stream) so the fused path covers training too.
        if cfg.use_pallas_attention:
            from ..ops.attention import fused_attention

            rate = (0.0 if deterministic
                    else cfg.attention_probs_dropout_prob)
            seed = None
            if rate > 0.0:
                # same per-module, per-step stream the XLA nn.Dropout
                # would consume -> rollout/replay programs derive the
                # same seed and stay bit-identical.
                seed = jax.random.bits(self.make_rng("dropout"), (1,),
                                       jnp.uint32)
            if attn_mask is None:
                add_mask = jnp.zeros((hidden.shape[0], context.shape[1]),
                                     jnp.float32)
            else:
                add_mask = attn_mask.reshape(attn_mask.shape[0], -1)
            out = fused_attention(
                jnp.moveaxis(q, -2, 1), jnp.moveaxis(k, -2, 1),
                jnp.moveaxis(v, -2, 1), add_mask,
                dropout_rate=rate, dropout_seed=seed,
            )
            out = jnp.moveaxis(out, 1, -2).astype(self.dtype)
            return out.reshape(*hidden.shape[:-1], h * hd)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(self.dtype)
        if attn_mask is not None:
            scores = scores + attn_mask.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.attention_probs_dropout_prob)(
            probs, deterministic=deterministic
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return out.reshape(*hidden.shape[:-1], h * hd)


class AttnOutput(nn.Module):
    """dense -> dropout -> LN(x + residual) (BertSelfOutput, :132-143)."""

    config: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, residual: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="dense")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            param_dtype=jnp.float32, name="LayerNorm")(x + residual)


class Attention(nn.Module):
    """MHA + output projection/LN (BertAttention / BertXAttention)."""

    config: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, context=None, attn_mask=None, deterministic=True):
        context = hidden if context is None else context
        attn = MultiHeadAttention(self.config, self.dtype, name="att")(
            hidden, context, attn_mask, deterministic
        )
        return AttnOutput(self.config, self.dtype, name="output")(
            attn, hidden, deterministic
        )


class FeedForward(nn.Module):
    """BertIntermediate + BertOutput (:159-185)."""

    config: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         param_dtype=jnp.float32, name="intermediate")(x)
        inter = ACT2FN[cfg.hidden_act](inter)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                       name="output")(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            param_dtype=jnp.float32, name="LayerNorm")(out + x)


class TransformerLayer(nn.Module):
    """Self-attention block (BertLayer, :188-201)."""

    config: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic=True):
        x = Attention(self.config, self.dtype, name="attention")(
            x, None, attn_mask, deterministic
        )
        return FeedForward(self.config, self.dtype, name="ffn")(x, deterministic)


class TransformerStack(nn.Module):
    """N self-attention layers (BertEncoder, :204-234)."""

    config: ModelConfig
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic=True):
        for i in range(self.num_layers):
            x = TransformerLayer(self.config, self.dtype, name=f"layer_{i}")(
                x, attn_mask, deterministic
            )
        return x


class CrossModalLayer(nn.Module):
    """LXRTX layer (vilmodel_cmt.py:361-424).

    Shared cross-attention applied both directions (the reference reuses
    ``self.visual_attention`` for lang->visn and visn->lang), then
    per-stream self-attention + FFN. ``no_lang_ca`` freezes the language
    stream entirely (its per-layer states are precomputed at text
    encoding time, vilmodel_cmt.py:645-652).
    """

    config: ModelConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.visual_attention = Attention(cfg, self.dtype)
        self.lang_self_att = Attention(cfg, self.dtype)
        self.visn_self_att = Attention(cfg, self.dtype)
        self.lang_ffn = FeedForward(cfg, self.dtype)
        self.visn_ffn = FeedForward(cfg, self.dtype)

    def __call__(self, lang, lang_mask, visn, visn_mask, deterministic=True):
        cfg = self.config
        if cfg.no_lang_ca:
            lang_x = lang
        else:
            lang_x = self.visual_attention(lang, visn, visn_mask, deterministic)
        visn_x = self.visual_attention(visn, lang, lang_mask, deterministic)

        if not cfg.no_lang_ca:
            lang_x = self.lang_self_att(lang_x, None, lang_mask, deterministic)
        visn_x = self.visn_self_att(visn_x, None, visn_mask, deterministic)

        if not cfg.no_lang_ca:
            lang_out = self.lang_ffn(lang_x, deterministic)
        else:
            lang_out = lang_x
        visn_out = self.visn_ffn(visn_x, deterministic)
        return lang_out, visn_out

    def lang_only(self, lang, lang_mask, deterministic=True):
        """The no_lang_ca precompute path (vilmodel_cmt.py:647-651):
        lang self-attention + FFN without any visual input."""
        lang_x = self.lang_self_att(lang, None, lang_mask, deterministic)
        return self.lang_ffn(lang_x, deterministic)
