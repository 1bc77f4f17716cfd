import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_hamt_tpu.configs import ModelConfig
from vln_hamt_tpu.vision.vit import ViTConfig
from vln_hamt_tpu.pretrain.image_model import (
    HAMTImagePretrain,
    IGNORE_ID,
    init_image_pretrain_params,
)

CFG = ModelConfig(hidden_size=64, num_attention_heads=4, intermediate_size=128,
                  num_l_layers=1, num_x_layers=1, num_h_pano_layers=1,
                  image_feat_size=48, image_prob_size=8,
                  max_position_embeddings=32, max_action_steps=8)
VIT = ViTConfig(img_size=(32, 32), patch_size=16, hidden_size=48,
                num_layers=2, num_heads=4, num_classes=8)
B, T, V, H, W = 2, 2, 6, 32, 32


@pytest.fixture(scope="module")
def img_model():
    model, params = init_image_pretrain_params(
        CFG, VIT, jax.random.PRNGKey(0), views=V, max_hist_len=T, instr_len=8)
    return model, params


def _batch():
    rng = np.random.default_rng(0)
    return {
        "txt_ids": jnp.asarray(rng.integers(1, 100, (B, 8)), jnp.int32),
        "txt_mask": jnp.ones((B, 8), bool),
        "txt_labels": jnp.asarray(
            np.where(rng.random((B, 8)) < 0.3, 5, IGNORE_ID), jnp.int32),
        "hist_pano_images": jnp.asarray(
            rng.integers(0, 255, (B, T, V, H, W, 3)), jnp.uint8),
        "hist_viewindex": jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32),
        "hist_ang": jnp.zeros((B, T, 4)),
        "hist_pano_ang": jnp.zeros((B, T, V, 4)),
        "hist_mask": jnp.ones((B, T + 1), bool),
        "hist_img_probs": jnp.ones((B, T, 8)) / 8,
        "hist_mrc_masks": jnp.asarray([[True, False], [False, True]]),
        "ob_images": jnp.asarray(rng.integers(0, 255, (B, V, H, W, 3)),
                                 jnp.uint8),
        "ob_ang": jnp.zeros((B, V + 1, 4)),
        "ob_nav": jnp.ones((B, V + 1), jnp.int32).at[:, V].set(2),
        "ob_mask": jnp.ones((B, V + 1), bool),
        "ob_action_viewindex": jnp.asarray([1, V], jnp.int32),
        "ob_action_angles": jnp.zeros((B, 2)),
        "ob_progress": jnp.asarray([0.0, 1.0]),
        "sp_anchor_idxs": jnp.asarray([0, 3], jnp.int32),
        "sp_targets": jnp.zeros((B, V, 2)),
        "itm_neg_idxs": jnp.asarray([[1], [0]], jnp.int32),
        "itm_shuffled_pos": jnp.zeros((1, B, T), jnp.int32),
        "ob_v_exists": jnp.ones((B,), jnp.float32),
    }


@pytest.mark.slow
def test_image_tasks_finite(img_model):
    model, params = img_model
    batch = _batch()
    for task in ("mrc", "sap", "mlm", "sar", "sprel", "itm"):
        loss, aux = model.apply({"params": params}, batch, task,
                                deterministic=True)
        assert np.isfinite(float(loss)), task


@pytest.mark.slow
def test_vit_gradient_routing(img_model):
    """Reference contract (image_vilmodel.py:40-59): history panoramas
    are encoded WITHOUT gradient; observation views WITH gradient."""
    model, params = img_model
    batch = _batch()

    def sap_loss(p):
        return model.apply({"params": p}, batch, "sap", deterministic=True)[0]

    g = jax.grad(sap_loss)(params)
    vit_g = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["vit"]))
    assert vit_g > 0  # obs branch trains the ViT

    def mrc_loss(p):
        return model.apply({"params": p}, batch, "mrc", deterministic=True)[0]

    g2 = jax.grad(mrc_loss)(params)
    vit_g2 = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g2["vit"]))
    assert vit_g2 == 0.0  # history-only task: ViT frozen


@pytest.mark.slow
def test_image_batcher():
    from vln_hamt_tpu.data.fixtures import make_synthetic_world
    from vln_hamt_tpu.pretrain import (
        TrajectoryDataset,
        make_synthetic_trajectories,
    )
    from vln_hamt_tpu.pretrain.image_data import (
        ImagePretrainBatcher,
        SyntheticPanoImageStore,
    )

    world = make_synthetic_world(num_scans=1, nodes_per_scan=10, num_items=6,
                                 feat_dim=56, seed=3)
    recs = make_synthetic_trajectories(world)
    ds = TrajectoryDataset(recs, world.graphs, world.feat_db,
                           image_feat_size=48, image_prob_size=8,
                           max_txt_len=16, max_hist_len=4)
    batcher = ImagePretrainBatcher(ds, SyntheticPanoImageStore((32, 32)),
                                   seed=0, vocab_mask_range=(1000, 2000))
    for task in ("mlm", "mrc", "sap", "sar", "sprel", "itm"):
        b = batcher.batch(task, 2)
        assert b["hist_pano_images"].shape == (2, 4, 36, 32, 32, 3)
        assert "hist_img" not in b and "ob_img" not in b
        if task in ("sap", "sar", "sprel"):
            assert b["ob_images"].shape == (2, 36, 32, 32, 3)
    with pytest.raises(ValueError):
        batcher.batch("nope", 2)
