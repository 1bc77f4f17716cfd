import jax
import numpy as np
import pytest

from vln_hamt_tpu.configs import HAMTConfig
from vln_hamt_tpu.data.fixtures import (
    add_synthetic_objects,
    make_synthetic_cvdn_items,
    make_synthetic_r2rback_items,
    make_synthetic_world,
)
from vln_hamt_tpu.env import CVDNNavEnv, ObsSpec, R2RBackNavEnv, ReverieNavEnv
from vln_hamt_tpu.agents import CVDNAgent, R2RBackAgent, ReverieAgent


def small_cfg(world, max_action_len, extra_model=None):
    max_deg = max(g.max_degree for g in world.graphs.values())
    model = {
        "hidden_size": 64, "num_attention_heads": 4, "intermediate_size": 128,
        "num_l_layers": 1, "num_x_layers": 1, "num_h_pano_layers": 1,
        "image_feat_size": 32, "max_position_embeddings": 64,
        "max_action_steps": 24, "feat_dropout": 0.1,
    }
    model.update(extra_model or {})
    return HAMTConfig().replace(
        model=model,
        env={"max_action_len": max_action_len, "max_instr_len": 32,
             "max_candidates": max_deg, "image_feat_size": 32},
        train={"batch_size": 4, "lr": 1e-3, "ml_weight": 1.0},
    )


@pytest.fixture(scope="module")
def vworld():
    return make_synthetic_world(num_scans=1, nodes_per_scan=14, num_items=8,
                                feat_dim=32, seed=9)


@pytest.mark.slow
def test_r2rback_agent(vworld):
    items = make_synthetic_r2rback_items(vworld)
    cfg = small_cfg(vworld, max_action_len=16)
    spec = ObsSpec(max_candidates=cfg.env.max_candidates, image_feat_size=32)
    env = R2RBackNavEnv(vworld.graphs, vworld.feat_db, items, spec,
                        batch_size=4, max_instr_len=32, max_action_len=16,
                        seed=0)
    agent = R2RBackAgent(cfg, env, seed=0)
    out = agent.train_iteration("sample")
    assert np.isfinite(out["loss"]) and np.isfinite(out["RL_loss"])
    preds = agent.eval_split()
    # every prediction should carry a midstop (first stop) or none if
    # the agent never stopped
    agg, _ = env.eval_metrics(preds)
    assert np.isfinite(agg["sr"])


@pytest.mark.slow
def test_cvdn_agent(vworld):
    items = make_synthetic_cvdn_items(vworld)
    cfg = small_cfg(vworld, max_action_len=10)
    spec = ObsSpec(max_candidates=cfg.env.max_candidates, image_feat_size=32)
    env = CVDNNavEnv(vworld.graphs, vworld.feat_db, items, spec,
                     batch_size=4, max_instr_len=32, max_action_len=10,
                     seed=0)
    agent = CVDNAgent(cfg, env, seed=0)
    out = agent.train_iteration("sample")
    assert np.isfinite(out["loss"]) and np.isfinite(out["RL_loss"])
    preds = agent.eval_split()
    agg, _ = env.eval_metrics(preds)
    assert "gp" in agg and np.isfinite(agg["gp"])
    # packed eval must handle raw NDH items (no precomputed "path";
    # CVDNNavEnv.load_item derives it) and match lock-step trajectories
    packed = {p["instr_id"]: [x[0] for x in p["trajectory"]]
              for p in agent.eval_split_packed()}
    lock = {p["instr_id"]: [x[0] for x in p["trajectory"]] for p in preds}
    assert set(packed) == set(lock)
    assert packed == lock


@pytest.mark.slow
def test_reverie_agent(vworld):
    obj_db, obj2vp = add_synthetic_objects(vworld, obj_feat_size=24, seed=1)
    cfg = small_cfg(vworld, max_action_len=10,
                    extra_model={"obj_feat_size": 24})
    spec = ObsSpec(max_candidates=cfg.env.max_candidates, image_feat_size=32)
    env = ReverieNavEnv(vworld.graphs, vworld.feat_db, vworld.instr_data, spec,
                        batch_size=4, max_instr_len=32, max_action_len=10,
                        seed=0, obj_db=obj_db, obj2viewpoint=obj2vp,
                        max_objects=4, obj_feat_size=24)
    agent = ReverieAgent(cfg, env, seed=0)
    out = agent.train_iteration("teacher")
    assert np.isfinite(out["loss"])
    out2 = agent.train_iteration("sample")
    assert np.isfinite(out2["loss"]) and np.isfinite(out2["RL_loss"])
    preds = agent.eval_split()
    # grounded object predicted at stop
    assert all("predObjId" in p for p in preds)
    agg, _ = env.eval_metrics(preds)
    for key in ("sr", "rgs", "rgspl"):
        assert np.isfinite(agg[key])
