"""Numerical parity vs the reference's vendored timm ViT.

Loads the ACTUAL reference file
(``pretrain_src/model/vision_transformer.py``) with timm's helper
imports stubbed (timm is not installed; the reference only uses
constants, ``to_2tuple``/``trunc_normal_`` and the model registry from
it), converts its randomly-initialized weights through
``convert_vit_state_dict``, and checks the flax ViT reproduces
``forward_features`` + ``head`` at <= 2e-4. This is the guarantee that
pretrained timm ViT-B/16 checkpoints (the reference featurizer's
weights, ``precompute_img_features_vit.py:69-77``) load correctly.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vln_hamt_tpu.models.convert import convert_vit_state_dict
from vln_hamt_tpu.vision.vit import ViT, ViTConfig, resize_pos_embed

REF_FILE = "/root/reference/pretrain_src/model/vision_transformer.py"


def _stub_timm():
    if "timm" in sys.modules:
        return
    import torch.nn as tnn

    timm = types.ModuleType("timm")
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    models = types.ModuleType("timm.models")
    helpers = types.ModuleType("timm.models.helpers")
    helpers.build_model_with_cfg = lambda *a, **k: None
    helpers.overlay_external_default_cfg = lambda *a, **k: None
    layers = types.ModuleType("timm.models.layers")

    class DropPath(tnn.Identity):
        def __init__(self, drop_prob=0.0):
            super().__init__()

    layers.DropPath = DropPath
    layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.lecun_normal_ = lambda t, *a, **k: t
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn
    for name, mod in (("timm", timm), ("timm.data", data),
                      ("timm.models", models),
                      ("timm.models.helpers", helpers),
                      ("timm.models.layers", layers),
                      ("timm.models.registry", registry)):
        sys.modules[name] = mod


@pytest.fixture(scope="module")
def ref_vit_module():
    _stub_timm()
    spec = importlib.util.spec_from_file_location("ref_vit", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _pair(ref_mod, img=32, patch=8, dim=48, depth=2, heads=4, classes=10):
    torch.manual_seed(0)
    ref = ref_mod.VisionTransformer(
        img_size=img, patch_size=patch, num_classes=classes,
        embed_dim=dim, depth=depth, num_heads=heads)
    ref.eval()
    cfg = ViTConfig(img_size=(img, img), patch_size=patch, hidden_size=dim,
                    num_layers=depth, num_heads=heads, num_classes=classes)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vit_state_dict(sd, num_layers=depth, num_heads=heads,
                                    grid=cfg.grid, patch_size=patch)
    return ref, ViT(cfg), params


def test_vit_forward_parity(ref_vit_module):
    ref, model, params = _pair(ref_vit_module)
    x = np.random.default_rng(0).standard_normal((3, 32, 32, 3)).astype(np.float32)
    feats, logits = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ref_feats = ref.forward_features(tx).numpy()
        ref_logits = ref.head(torch.from_numpy(ref_feats)).numpy()
    np.testing.assert_allclose(np.asarray(feats), ref_feats,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=2e-4, atol=2e-4)


def test_vit_pos_embed_resize_parity(ref_vit_module):
    """Grid-mismatch ingestion: our bilinear resize must equal the
    reference's resize_pos_embed (vision_transformer.py:399-417)."""
    torch.manual_seed(1)
    pos = torch.randn(1, 4 * 4 + 1, 48)
    target = torch.zeros(1, 6 * 6 + 1, 48)
    want = ref_vit_module.resize_pos_embed(pos, target).numpy()
    got = np.asarray(resize_pos_embed(jnp.asarray(pos.numpy()), (6, 6), (4, 4)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_convert_resizes_on_grid_mismatch(ref_vit_module):
    """Loading a 32px checkpoint into a 48px model goes through the
    resize path and still applies cleanly."""
    ref, _, _ = _pair(ref_vit_module)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = ViTConfig(img_size=(48, 48), patch_size=8, hidden_size=48,
                    num_layers=2, num_heads=4, num_classes=10)
    params = convert_vit_state_dict(sd, num_layers=2, num_heads=4,
                                    grid=cfg.grid, patch_size=8)
    assert params["pos_embed"].shape == (1, cfg.num_patches + 1, 48)
    x = np.zeros((1, 48, 48, 3), np.float32)
    feats, logits = ViT(cfg).apply({"params": params}, jnp.asarray(x))
    assert np.isfinite(np.asarray(feats)).all()


def test_e2e_extraction_matches_reference_pipeline(ref_vit_module):
    """The WHOLE extraction chain — equirect -> native 640x480@VFOV60
    render -> timm eval transform -> featurizer ViT -> (36, D+C) HDF5
    matrix — matches a reference-style torch pipeline (torchvision/PIL
    transform oracle + the reference's vendored VisionTransformer,
    precompute_img_features_vit.py:49-52,96-108) run on the SAME
    renders, at <= 2e-4. Certifies features regenerated by
    run/precompute_features.py as interchangeable with
    reference-extracted ones (given identical view renders; the render
    geometry itself is pinned by test_image_transform/test_native)."""
    from test_image_transform import oracle_eval

    from vln_hamt_tpu.native import sample_panorama
    from vln_hamt_tpu.vision.featurizer import PanoramaFeaturizer
    from vln_hamt_tpu.vision.transforms import eval_transform

    torch.manual_seed(2)
    ref = ref_vit_module.VisionTransformer(
        img_size=224, patch_size=16, num_classes=20, embed_dim=48,
        depth=2, num_heads=4)
    ref.eval()
    cfg = ViTConfig(img_size=(224, 224), patch_size=16, hidden_size=48,
                    num_layers=2, num_heads=4, num_classes=20)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vit_state_dict(sd, num_layers=2, num_heads=4,
                                    grid=cfg.grid, patch_size=16)

    equirect = np.random.default_rng(7).integers(
        0, 255, (512, 1024, 3), dtype=np.uint8)
    views = sample_panorama(equirect, np.deg2rad(60.0), 640, 480)
    assert views.shape == (36, 480, 640, 3)

    # ours: the production featurizer defaults (timm transform on host,
    # mean=std=0.5 normalization on device, fp32 model for tolerance)
    feat = PanoramaFeaturizer(ViT(cfg), params, panos_per_batch=1)
    mat = feat.extract([("s", "vp", eval_transform(views))])["s_vp"]
    assert mat.shape == (36, 48 + 20)

    with torch.no_grad():
        tx = torch.stack([oracle_eval(v) for v in views])
        ref_feats = ref.forward_features(tx)
        want = torch.cat([ref_feats, ref.head(ref_feats)], dim=1).numpy()
    np.testing.assert_allclose(mat, want, rtol=2e-4, atol=2e-4)


def test_load_vit_checkpoint_npz(ref_vit_module, tmp_path):
    """CLI entry: .npz state-dict files load through load_vit_checkpoint."""
    from vln_hamt_tpu.models.convert import load_vit_checkpoint

    ref, model, want = _pair(ref_vit_module)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    path = tmp_path / "vit.npz"
    np.savez(path, **sd)
    got = load_vit_checkpoint(str(path), model)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
