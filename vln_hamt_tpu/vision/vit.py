"""Vision Transformer backbone (flax).

Parity target: the vendored timm ViT-B/16 in the reference
(``pretrain_src/model/vision_transformer.py``: conv patch embed, cls
token, learned position embeddings, 12 pre-LN blocks, final LN;
``forward_features`` returns the pre-logits CLS state, ``head`` the
1000-way ImageNet logits; :336-348, :399-434 for pos-embed resizing).

TPU notes: images come in NHWC uint8; normalization happens on device
in the featurizer. The patch embedding is a conv that XLA lowers to one
big MXU matmul; everything runs in the configured dtype (bfloat16 by
default on TPU) with fp32 params.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    dropout: float = 0.0
    dtype: str = "float32"

    @property
    def grid(self) -> Tuple[int, int]:
        return (self.img_size[0] // self.patch_size,
                self.img_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid
        return gh * gw


def _dt(cfg: ViTConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class ViTBlock(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        dtype = _dt(cfg)
        h = nn.LayerNorm(epsilon=1e-6, dtype=dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dtype=dtype, param_dtype=jnp.float32,
            dropout_rate=cfg.dropout, deterministic=deterministic, name="attn",
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        h = nn.Dense(int(cfg.hidden_size * cfg.mlp_ratio), dtype=dtype,
                     param_dtype=jnp.float32, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=dtype, param_dtype=jnp.float32,
                     name="mlp_fc2")(h)
        return x + h


class ViT(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True,
                 return_logits: bool = True):
        """images: (B, H, W, 3) float in normalized range.

        Returns (features (B, D), logits (B, C)) — features are the
        final-LN CLS state (timm forward_features parity).
        """
        cfg = self.config
        dtype = _dt(cfg)
        b = images.shape[0]
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    dtype=dtype, param_dtype=jnp.float32, name="patch_embed",
                    )(images.astype(dtype))
        x = x.reshape(b, -1, cfg.hidden_size)  # (B, N, D)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(dtype),
                                              (b, 1, cfg.hidden_size)), x], 1)
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02),
                         (1, cfg.num_patches + 1, cfg.hidden_size), jnp.float32)
        x = x + pos.astype(dtype)

        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, name=f"block_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=dtype, param_dtype=jnp.float32,
                         name="norm")(x)
        features = x[:, 0].astype(jnp.float32)
        if not return_logits:
            return features, None
        logits = nn.Dense(cfg.num_classes, dtype=dtype,
                          param_dtype=jnp.float32, name="head")(x[:, 0])
        return features, logits.astype(jnp.float32)


def vit_base_patch16(img_size=(224, 224), dtype="float32",
                     num_classes=1000) -> ViT:
    return ViT(ViTConfig(img_size=tuple(img_size), dtype=dtype,
                         num_classes=num_classes))


def init_vit_params(model: ViT, rng: jax.Array):
    cfg = model.config
    dummy = jnp.zeros((1, *cfg.img_size, 3), jnp.float32)
    return model.init({"params": rng}, dummy)["params"]


def resize_pos_embed(pos: jnp.ndarray, new_grid: Tuple[int, int],
                     old_grid: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear position-embedding resize for a different input size
    (vision_transformer.py:399-419)."""
    cls_tok, grid_tok = pos[:, :1], pos[:, 1:]
    d = pos.shape[-1]
    grid_tok = grid_tok.reshape(1, *old_grid, d)
    # antialias off: parity with torch F.interpolate(mode='bilinear')
    # in the reference's resize_pos_embed (vision_transformer.py:410-414)
    grid_tok = jax.image.resize(grid_tok, (1, *new_grid, d),
                                method="bilinear", antialias=False)
    return jnp.concatenate([cls_tok, grid_tok.reshape(1, -1, d)], axis=1)
