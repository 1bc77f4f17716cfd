"""End-to-end image pretraining: ViT-in-the-loop HAMT.

Parity target: ``pretrain_src/model/image_vilmodel.py`` /
``image_pretrain.py`` (NavTHORImagePreTrainedModel) — the variant where
panorama FEATURES are replaced by a trainable ViT over raw pixels. The
reference's behavioral contract (reconstructed; its module graph is
broken in-tree, SURVEY §2.4):

- history panoramas are encoded WITHOUT gradient (torch.no_grad "due to
  memory", image_vilmodel.py:40-59) — here ``stop_gradient`` plus
  ``jax.checkpoint`` on the obs branch trades recompute for memory the
  TPU way;
- current-view/observation features keep gradients;
- MRC masking applies post-ViT (image_vilmodel.py:83-85);
- the STOP token is appended device-side (:104-106).

The cross-modal trunk and task heads are the SAME `HAMTPretrain`
modules — only the feature source changes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..vision.vit import ViT, ViTConfig
from .model import HAMTPretrain, IGNORE_ID


class HAMTImagePretrain(nn.Module):
    """ViT + HAMTPretrain; raw pano pixels in, task losses out."""

    config: "ModelConfig"  # noqa: F821 - vln_hamt_tpu.configs.ModelConfig
    vit_config: ViTConfig

    def setup(self):
        self.vit = ViT(self.vit_config)
        self.trunk = HAMTPretrain(self.config)

    def _encode_views(self, images: jnp.ndarray, deterministic: bool,
                      with_grad: bool) -> jnp.ndarray:
        """(..., H, W, 3) uint8/float -> (..., D) ViT features.

        Normalization = the reference ViT data config's mean=std=0.5
        (vision_transformer.py:58; applied by the timm transform at
        image_data.py:70-80) — the geometric stages (resize/crop) run
        host-side in ImagePretrainBatcher's ImageTransform."""
        from ..vision.transforms import normalize_images

        lead = images.shape[:-3]
        flat = images.reshape((-1,) + images.shape[-3:])
        flat = normalize_images(flat)

        def run(x):
            feats, _ = self.vit(x, deterministic=deterministic,
                                return_logits=False)
            return feats

        feats = run(flat)
        if not with_grad:
            feats = jax.lax.stop_gradient(feats)
        return feats.reshape(lead + (feats.shape[-1],))

    def __call__(self, batch: Dict[str, jnp.ndarray], task: str,
                 deterministic: bool = False, feat_table=None):
        """Replace image tensors with ViT features, then dispatch to the
        shared trunk. (``feat_table`` accepted for trainer-signature
        compatibility; the e2e path featurizes raw pixels instead.)
        Expected image keys (uint8):
        - hist_pano_images (B, T, V, H, W, 3): per-step panoramas
        - ob_images (B, V, H, W, 3): current 36 views (STOP appended)
        Other batch entries pass through (angles, masks, labels).
        """
        b = batch["txt_ids"].shape[0]
        fed = dict(batch)

        if "hist_pano_images" in batch:
            # no-grad pano history (image_vilmodel.py:40-59)
            pano_feats = self._encode_views(batch["hist_pano_images"],
                                            deterministic, with_grad=False)
            fed["hist_pano_img"] = pano_feats
            # per-step "current view" feature = the view the agent faced
            vidx = batch["hist_viewindex"]  # (B, T)
            fed["hist_img"] = jnp.take_along_axis(
                pano_feats, vidx[..., None, None], axis=2
            ).squeeze(2)
            # post-ViT MRC input masking (image_vilmodel.py:83-85)
            if task == "mrc":
                m = batch["hist_mrc_masks"]
                fed["hist_img"] = jnp.where(m[..., None], 0.0, fed["hist_img"])
                fed["hist_pano_img"] = jnp.where(
                    m[..., None, None], 0.0, fed["hist_pano_img"])

        if "ob_images" in batch:
            # with-grad current observation (image_vilmodel.py:60-82)
            ob_feats = self._encode_views(batch["ob_images"], deterministic,
                                          with_grad=True)
            # random visual kill (ob_v_exists zeroing, :101-102)
            if "ob_v_exists" in batch:
                ob_feats = ob_feats * batch["ob_v_exists"][:, None, None]
            # device-side STOP token append (:104-106)
            stop = jnp.zeros((b, 1, ob_feats.shape[-1]), ob_feats.dtype)
            fed["ob_img"] = jnp.concatenate([ob_feats, stop], axis=1)

        return self.trunk(fed, task, deterministic=deterministic)


def init_image_pretrain_params(cfg, vit_cfg: ViTConfig, rng: jax.Array,
                               views: int = 36, max_hist_len: int = 2,
                               instr_len: int = 8):
    """Initialize via one small MRC + SAP forward over dummy images."""
    model = HAMTImagePretrain(cfg, vit_cfg)
    b = 1
    h, w = vit_cfg.img_size
    dummy = {
        "txt_ids": jnp.zeros((b, instr_len), jnp.int32),
        "txt_mask": jnp.ones((b, instr_len), bool),
        "txt_labels": jnp.full((b, instr_len), IGNORE_ID, jnp.int32),
        "hist_pano_images": jnp.zeros((b, max_hist_len, views, h, w, 3),
                                      jnp.uint8),
        "hist_viewindex": jnp.zeros((b, max_hist_len), jnp.int32),
        "hist_ang": jnp.zeros((b, max_hist_len, cfg.angle_feat_size)),
        "hist_pano_ang": jnp.zeros((b, max_hist_len, views,
                                    cfg.angle_feat_size)),
        "hist_mask": jnp.ones((b, max_hist_len + 1), bool),
        "hist_img_probs": jnp.ones((b, max_hist_len, cfg.image_prob_size))
        / cfg.image_prob_size,
        "hist_mrc_masks": jnp.ones((b, max_hist_len), bool),
        "ob_images": jnp.zeros((b, views, h, w, 3), jnp.uint8),
        "ob_ang": jnp.zeros((b, views + 1, cfg.angle_feat_size)),
        "ob_nav": jnp.ones((b, views + 1), jnp.int32),
        "ob_mask": jnp.ones((b, views + 1), bool),
        "ob_action_viewindex": jnp.zeros((b,), jnp.int32),
        "ob_action_angles": jnp.zeros((b, 2)),
        "ob_progress": jnp.zeros((b,)),
        "sp_anchor_idxs": jnp.zeros((b,), jnp.int32),
        "sp_targets": jnp.zeros((b, views, 2)),
        "itm_neg_idxs": jnp.zeros((b, 1), jnp.int32),
        "itm_shuffled_pos": jnp.zeros((1, b, max_hist_len), jnp.int32),
        "ob_v_exists": jnp.ones((b,), jnp.float32),
    }

    def init_fn(self, batch):
        total = 0.0
        for task in ("mlm", "mrc", "itm", "sap", "sar", "sprel"):
            loss, _ = self(batch, task, deterministic=True)
            total = total + loss
        return total

    k1, k2 = jax.random.split(rng)
    variables = model.init({"params": k1, "dropout": k2}, dummy,
                           method=init_fn)
    return model, variables["params"]
