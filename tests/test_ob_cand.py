"""Candidate-first pretrain observation layout (ob_cand_pano_view).

Pins ``TrajectoryDataset.ob_cand_arrays`` against the REFERENCE's
``MultiStepNavData.get_ob_cand_pano_view`` (r2r_data.py:222-261), run
standalone on a stub instance with our synthetic world's features and
a ``scanvp_cands`` dict built from the same graph (the reference reads
it from a preprocessed JSON; its entries are
``next_vp -> [pointId, _, d_heading, d_elevation]`` where the deltas
are the exact edge angle minus the discretized view center — verified
by the telescoping in :240-244). Also covers the index-mode device
expansion and the batcher integration.
"""

import sys
import types

import numpy as np
import pytest

from vln_hamt_tpu.data.angle import (
    all_point_angle_feature,
    view_elevation,
    view_heading,
)
from vln_hamt_tpu.data.fixtures import make_synthetic_world
from vln_hamt_tpu.pretrain import TrajectoryDataset, make_synthetic_trajectories
from vln_hamt_tpu.pretrain.trajectory_data import NUM_VIEWS, standardize_radians

REF_PATH = "/root/reference/pretrain_src"


@pytest.fixture(scope="module")
def ref_navdata_cls():
    """Import the reference module (jsonlines stubbed, np.bool shimmed
    — SURVEY §2.4 known defects)."""
    if "jsonlines" not in sys.modules:
        fake = types.ModuleType("jsonlines")
        fake.Reader = lambda f: iter(())
        sys.modules["jsonlines"] = fake
    if not hasattr(np, "bool"):
        np.bool = np.bool_  # removed in numpy>=1.24; r2r_data.py:230 uses it
    sys.path.insert(0, REF_PATH)
    try:
        from data.r2r_data import MultiStepNavData
    finally:
        sys.path.remove(REF_PATH)
    return MultiStepNavData


@pytest.fixture(scope="module")
def world():
    return make_synthetic_world(num_scans=1, nodes_per_scan=12, num_items=8,
                                feat_dim=24, seed=11)


@pytest.fixture(scope="module")
def dataset(world):
    recs = make_synthetic_trajectories(world)
    return TrajectoryDataset(recs, world.graphs, world.feat_db,
                             image_feat_size=16, image_prob_size=8,
                             max_txt_len=12, max_hist_len=4,
                             ob_cand_pano_view=True)


def _make_ref_stub(cls, ds, rec):
    """A MultiStepNavData carcass wired to our synthetic world."""
    sys.path.insert(0, REF_PATH)
    try:
        from data.r2r_data import get_all_point_rel_angles
    finally:
        sys.path.remove(REF_PATH)

    obj = cls.__new__(cls)
    obj.image_feat_size = ds.image_feat_size
    obj.angle_feat_size = ds.angle_feat_size
    obj.rel_angles = get_all_point_rel_angles()
    g = ds.graphs[rec.scan]

    # scanvp_cands: per current viewpoint, next_vp -> [pid, 0, dh, de]
    cands = {}
    for vp in rec.path:
        node = g.index(vp)
        entry = {}
        for j in np.nonzero(g.nbr_index[node] >= 0)[0]:
            nxt = g.node_ids[g.nbr_index[node, j]]
            pid = int(g.nbr_point_id[node, j])
            dh = float(g.nbr_heading[node, j] - view_heading(pid))
            de = float(g.nbr_elevation[node, j] - view_elevation(pid))
            entry[nxt] = [pid, 0, dh, de]
        cands[f"{rec.scan}_{vp}"] = entry
    obj.scanvp_cands = cands

    ang_table = all_point_angle_feature(ds.angle_feat_size)
    obj.get_image_feature = (
        lambda scan, vp, pad_stop_token=False:
        ds.feat_db.get(scan, vp).astype(np.float32))
    obj.get_angle_feature = (
        lambda vidx, pad_stop_token=False: ang_table[vidx])
    return obj


def test_ob_cand_matches_reference(ref_navdata_cls, dataset):
    """Our candidate-first assembly equals the reference function's
    output row-for-row (features, angles, nav types, SAP slot label)
    for every step of every synthetic trajectory."""
    checked_nonstop = checked_stop = 0
    for rec in dataset.records[:6]:
        ref = _make_ref_stub(ref_navdata_cls, dataset, rec)
        for t in range(len(rec.path)):
            r_img, r_ang, r_nav, r_label, r_angle = ref.get_ob_cand_pano_view(
                rec.scan, rec.path, rec.path_viewindex,
                rec.action_viewindex, rec.rel_act_angles, t)
            ours = dataset.ob_cand_arrays(rec, t)
            n = len(r_nav)
            assert ours["ob_mask"][:n].all()
            assert not ours["ob_mask"][n:].any()
            np.testing.assert_array_equal(ours["ob_nav"][:n], r_nav)
            np.testing.assert_array_equal(ours["ob_nav"][n:], 0)
            np.testing.assert_allclose(ours["ob_img"][:n], r_img, atol=1e-6)
            np.testing.assert_allclose(ours["ob_ang"][:n], r_ang, atol=1e-6)
            assert int(ours["ob_action_viewindex"]) == int(r_label)
            np.testing.assert_allclose(
                ours["ob_action_angles"], standardize_radians(r_angle),
                atol=1e-6)
            if int(r_label) == int(np.sum(r_nav == 1)):
                checked_stop += 1
            else:
                checked_nonstop += 1
    assert checked_nonstop > 0 and checked_stop > 0


def test_ob_cand_index_mode_matches_feature_mode(world, dataset):
    """Index-mode (ob_perm + device gather) reproduces the feature-mode
    candidate assembly exactly — the feature-table-transport invariant
    extended to the cand layout."""
    import jax.numpy as jnp

    from vln_hamt_tpu.configs import ModelConfig
    from vln_hamt_tpu.data.feature_db import build_feature_table
    from vln_hamt_tpu.pretrain.model import expand_index_batch

    recs = dataset.records
    ds_idx = TrajectoryDataset(recs, world.graphs, world.feat_db,
                               image_feat_size=16, image_prob_size=8,
                               max_txt_len=12, max_hist_len=4,
                               ob_cand_pano_view=True)
    table, offsets = build_feature_table(world.graphs, world.feat_db)
    ds_idx.set_feat_offsets(offsets)

    cfg = ModelConfig(image_feat_size=16, image_prob_size=8)
    rec = recs[0]
    for t in range(len(rec.path)):
        feat = dataset.ob_cand_arrays(rec, t)
        idx = ds_idx.ob_cand_arrays(rec, t)
        assert "ob_img" not in idx and "ob_perm" in idx
        batch = {k: jnp.asarray(v)[None] for k, v in idx.items()}
        batch["ob_kill_v"] = jnp.zeros((1,), bool)
        batch["ob_kill_a"] = jnp.zeros((1,), bool)
        # expand_index_batch also needs the history keys
        hist = ds_idx.history_arrays(rec, 0)
        for k, v in hist.items():
            batch[k] = jnp.asarray(v)[None]
        batch["hist_len"] = jnp.asarray([0])
        out = expand_index_batch(batch, jnp.asarray(table), cfg)
        np.testing.assert_allclose(np.asarray(out["ob_img"][0]),
                                   feat["ob_img"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["ob_ang"][0]),
                                   feat["ob_ang"], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out["ob_mask"][0]),
                                      feat["ob_mask"])


def test_cand_layout_batcher_and_model(world, dataset):
    """SAP/SAR batches in the cand layout run through the model; SpRel
    stays pinned to the pano layout (r2r_tasks.py:514-517)."""
    import jax

    from vln_hamt_tpu.configs import ModelConfig
    from vln_hamt_tpu.pretrain import PretrainBatcher
    from vln_hamt_tpu.pretrain.model import init_pretrain_params

    batcher = PretrainBatcher(dataset, seed=0,
                              vocab_mask_range=(1000, 2000))
    w = dataset.ob_width
    b_sap = batcher.batch("sap", 2)
    assert b_sap["ob_img"].shape == (2, w, 16)
    assert b_sap["ob_nav"].shape == (2, w)
    b_sprel = batcher.batch("sprel", 2)
    assert b_sprel["ob_img"].shape == (2, NUM_VIEWS + 1, 16)

    cfg = ModelConfig(hidden_size=32, num_attention_heads=2,
                      intermediate_size=64, num_l_layers=1, num_x_layers=1,
                      num_h_pano_layers=1, image_feat_size=16,
                      image_prob_size=8, max_position_embeddings=32,
                      max_action_steps=8)
    model, params = init_pretrain_params(cfg, jax.random.PRNGKey(0),
                                         max_hist_len=4, instr_len=12)
    for task, b in (("sap", b_sap), ("sar", batcher.batch("sar", 2)),
                    ("sprel", b_sprel)):
        loss, aux = model.apply({"params": params},
                                {k: jax.numpy.asarray(v)
                                 for k, v in b.items()}, task,
                                deterministic=True)
        assert np.isfinite(float(loss)), task


def test_cand_width_overflow_raises(world):
    recs = make_synthetic_trajectories(world)
    ds = TrajectoryDataset(recs, world.graphs, world.feat_db,
                           image_feat_size=16, image_prob_size=8,
                           max_txt_len=12, max_hist_len=4,
                           ob_cand_pano_view=True, ob_cand_extra=-10)
    rec = recs[0]
    with pytest.raises(ValueError, match="ob_cand_extra"):
        ds.ob_cand_arrays(rec, 0)
