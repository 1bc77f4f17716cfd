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
    # packed eval carries the two-phase state per slot (first STOP ->
    # midstop, second STOP -> done) and must match lock-step exactly
    packed = {p["instr_id"]: ([x[0] for x in p["trajectory"]],
                              p.get("midstop"))
              for p in agent.eval_split_packed()}
    lock = {p["instr_id"]: ([x[0] for x in p["trajectory"]],
                            p.get("midstop")) for p in preds}
    assert set(packed) == set(lock)
    assert packed == lock
    agg_p, _ = env.eval_metrics(
        [{"instr_id": k, "trajectory": [(vp, 0.0, 0.0) for vp in t],
          "midstop": ms} for k, (t, ms) in packed.items()])
    assert agg_p["sr"] == agg["sr"]


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


@pytest.mark.slow
@pytest.mark.parametrize("task", ["r2r_back", "cvdn"])
def test_variant_device_rollout_matches_host(vworld, task):
    """The variant reward shapings compiled into the device rollout scan
    (rollout.py task='r2r_back'/'cvdn') must reproduce the host rollout
    hooks exactly: logits, actions, visited nodes, rewards, masks, and
    the bootstrap mask."""
    if task == "r2r_back":
        items = make_synthetic_r2rback_items(vworld)
        env_cls, agent_cls, t_max = R2RBackNavEnv, R2RBackAgent, 16
    else:
        items = make_synthetic_cvdn_items(vworld)
        env_cls, agent_cls, t_max = CVDNNavEnv, CVDNAgent, 10
    cfg = small_cfg(vworld, max_action_len=t_max)
    spec = ObsSpec(max_candidates=cfg.env.max_candidates, image_feat_size=32)

    def make():
        env = env_cls(vworld.graphs, vworld.feat_db, items, spec,
                      batch_size=4, max_instr_len=32, max_action_len=t_max,
                      seed=0)
        agent = agent_cls(cfg, env, seed=0)
        agent.enable_feature_table()
        return agent

    rng = jax.random.PRNGKey(42)
    a1 = make()
    _, host = a1.interactive_rollout("sample", rng, deterministic=False,
                                     record_for_replay=True)
    a2 = make()
    dev_ep, dev = a2.device_rollout_iteration(rng)

    hl = host["rollout_logits"]
    t_used = hl.shape[0]
    dl = np.asarray(dev["rollout_logits"])[:t_used]
    fin = np.isfinite(hl)
    np.testing.assert_allclose(dl[fin], hl[fin], rtol=2e-4, atol=2e-4)
    for k in ("actions", "step_mask", "node_idx", "view_index"):
        np.testing.assert_array_equal(np.asarray(dev_ep[k]),
                                      np.asarray(host["ep"][k]), err_msg=k)
    np.testing.assert_allclose(np.asarray(dev["rewards"]),
                               np.asarray(host["rewards"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dev["masks"]),
                                  np.asarray(host["masks"]))
    np.testing.assert_array_equal(np.asarray(dev["bootstrap_mask"]),
                                  np.asarray(host["bootstrap_mask"]))

    # end-to-end: identical IL+RL updates through train_iteration
    a3, a4 = make(), make()
    a3.device_rollout_rewards = False  # host path
    h = [float(a3.train_iteration("sample")["loss"]) for _ in range(2)]
    d = [float(a4.train_iteration("sample")["loss"]) for _ in range(2)]
    np.testing.assert_allclose(h, d, rtol=2e-5)


@pytest.mark.slow
def test_reverie_device_rollout_matches_host(vworld):
    """The object-grounded sampling rollout compiled into the device
    scan (rollout.py task='reverie': plan_ref core, per-node object
    table gathers, appended obj-stop slot, multi-goal distance slab)
    must reproduce the host rollout exactly: logits, actions, visited
    nodes, rewards, masks, bootstrap mask."""
    obj_db, obj2vp = add_synthetic_objects(vworld, obj_feat_size=24, seed=1)
    cfg = small_cfg(vworld, max_action_len=10,
                    extra_model={"obj_feat_size": 24})
    spec = ObsSpec(max_candidates=cfg.env.max_candidates, image_feat_size=32)

    def make():
        env = ReverieNavEnv(vworld.graphs, vworld.feat_db, vworld.instr_data,
                            spec, batch_size=4, max_instr_len=32,
                            max_action_len=10, seed=0, obj_db=obj_db,
                            obj2viewpoint=obj2vp, max_objects=4,
                            obj_feat_size=24)
        agent = ReverieAgent(cfg, env, seed=0)
        agent.enable_feature_table()
        return agent

    rng = jax.random.PRNGKey(42)
    a1 = make()
    a1.device_rollout_rewards = False  # force the host loop
    _, host = a1.interactive_rollout("sample", rng, deterministic=False,
                                     record_for_replay=True)
    a2 = make()
    dev_ep, dev = a2.device_rollout_iteration(rng)

    hl = host["rollout_logits"]
    t_used = hl.shape[0]
    dl = np.asarray(dev["rollout_logits"])[:t_used]
    fin = np.isfinite(hl)
    np.testing.assert_allclose(dl[fin], hl[fin], rtol=2e-4, atol=2e-4)
    assert np.array_equal(np.isfinite(dl), fin)
    for k in ("actions", "step_mask", "node_idx", "view_index"):
        np.testing.assert_array_equal(np.asarray(dev_ep[k]),
                                      np.asarray(host["ep"][k]), err_msg=k)
    np.testing.assert_allclose(np.asarray(dev["rewards"]),
                               np.asarray(host["rewards"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dev["masks"]),
                                  np.asarray(host["masks"]))
    np.testing.assert_array_equal(np.asarray(dev["bootstrap_mask"]),
                                  np.asarray(host["bootstrap_mask"]))


@pytest.mark.slow
def test_reverie_feature_table_matches_plain(vworld):
    """REVERIE feature-table transport (pano + node-aligned object
    tables, device-side gathers + angle computation) must produce
    bit-identical training updates and eval trajectories."""
    obj_db, obj2vp = add_synthetic_objects(vworld, obj_feat_size=24, seed=1)
    cfg = small_cfg(vworld, max_action_len=10,
                    extra_model={"obj_feat_size": 24})
    spec = ObsSpec(max_candidates=cfg.env.max_candidates, image_feat_size=32)

    def make(table):
        env = ReverieNavEnv(vworld.graphs, vworld.feat_db, vworld.instr_data,
                            spec, batch_size=4, max_instr_len=32,
                            max_action_len=10, seed=0, obj_db=obj_db,
                            obj2viewpoint=obj2vp, max_objects=4,
                            obj_feat_size=24)
        agent = ReverieAgent(cfg, env, seed=0)
        if table:
            agent.enable_feature_table()
            assert agent._obj_tables is not None
        return agent

    losses = {}
    for table in (False, True):
        agent = make(table)
        losses[table] = [float(agent.train_iteration("sample")["loss"])
                         for _ in range(2)]
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-5)

    def run_eval(table):
        agent = make(table)
        lock = {p["instr_id"]: ([x[0] for x in p["trajectory"]],
                                p.get("predObjId"))
                for p in agent.eval_split()}
        # continuation-packed eval (object-grounded policy step per
        # slot, predObjId at stop) must match lock-step in both
        # transports
        packed = {p["instr_id"]: ([x[0] for x in p["trajectory"]],
                                  p.get("predObjId"))
                  for p in agent.eval_split_packed()}
        assert packed == lock
        return lock

    assert run_eval(True) == run_eval(False)


@pytest.mark.slow
def test_variant_merged_sample_updates(vworld):
    """The merged single-scan 'sample' update (IL lanes inside the
    rollout scan, PARITY.md #18) must run to finite losses for every
    task that supports a device rollout — REVERIE's lanes additionally
    carry the dual act+object CE (ReverieAgent._merged_il_loss)."""
    # r2r_back / cvdn ride the base merged path
    items_back = make_synthetic_r2rback_items(vworld)
    cfg = small_cfg(vworld, max_action_len=10)
    spec = ObsSpec(max_candidates=cfg.env.max_candidates, image_feat_size=32)
    back = R2RBackAgent(cfg, R2RBackNavEnv(
        vworld.graphs, vworld.feat_db, items_back, spec, batch_size=4,
        max_instr_len=32, max_action_len=10, seed=0), seed=0)
    cvdn = CVDNAgent(cfg, CVDNNavEnv(
        vworld.graphs, vworld.feat_db, make_synthetic_cvdn_items(vworld),
        spec, batch_size=4, max_instr_len=32, max_action_len=10, seed=0),
        seed=0)
    obj_db, obj2vp = add_synthetic_objects(vworld, obj_feat_size=24, seed=1)
    # no_lang_ca like the real REVERIE preset: text states are
    # (X+1, B, L, D) — the merged bootstrap must slice batch axis 1
    rcfg = small_cfg(vworld, max_action_len=10,
                     extra_model={"obj_feat_size": 24, "no_lang_ca": True})
    rev = ReverieAgent(rcfg, ReverieNavEnv(
        vworld.graphs, vworld.feat_db, vworld.instr_data, spec, batch_size=4,
        max_instr_len=32, max_action_len=10, seed=0, obj_db=obj_db,
        obj2viewpoint=obj2vp, max_objects=4, obj_feat_size=24), seed=0)

    for agent in (back, cvdn, rev):
        agent.enable_feature_table()
        agent.merged_sample_update = True
        out = [agent.train_iteration("sample") for _ in range(2)]
        assert np.isfinite([o["loss"] for o in out]).all(), type(agent)
        assert np.isfinite([o["RL_loss"] for o in out]).all(), type(agent)


@pytest.mark.slow
def test_variant_device_eval_matches_lockstep(vworld):
    """Device-scan greedy eval for the task variants: trajectories,
    R2R-Back midstops (eval two-phase ending, no RL force-end), and
    REVERIE predObjId must match the lock-step evaluator."""
    cfg = small_cfg(vworld, max_action_len=10)
    spec = ObsSpec(max_candidates=cfg.env.max_candidates, image_feat_size=32)

    back = R2RBackAgent(cfg, R2RBackNavEnv(
        vworld.graphs, vworld.feat_db, make_synthetic_r2rback_items(vworld),
        spec, batch_size=4, max_instr_len=32, max_action_len=10, seed=0),
        seed=0)
    cvdn = CVDNAgent(cfg, CVDNNavEnv(
        vworld.graphs, vworld.feat_db, make_synthetic_cvdn_items(vworld),
        spec, batch_size=4, max_instr_len=32, max_action_len=10, seed=0),
        seed=0)
    obj_db, obj2vp = add_synthetic_objects(vworld, obj_feat_size=24, seed=1)
    rcfg = small_cfg(vworld, max_action_len=10,
                     extra_model={"obj_feat_size": 24, "no_lang_ca": True})
    rev = ReverieAgent(rcfg, ReverieNavEnv(
        vworld.graphs, vworld.feat_db, vworld.instr_data, spec, batch_size=4,
        max_instr_len=32, max_action_len=10, seed=0, obj_db=obj_db,
        obj2viewpoint=obj2vp, max_objects=4, obj_feat_size=24), seed=0)

    for agent in (back, cvdn, rev):
        agent.enable_feature_table()
        env = agent.env
        lock = {p["instr_id"]: p for p in agent.eval_split(env)}
        dev = {p["instr_id"]: p for p in agent.eval_split_device(env)}
        assert set(lock) == set(dev), type(agent)
        for k in lock:
            lt = [x[0] for x in lock[k]["trajectory"]]
            dt = [x[0] for x in dev[k]["trajectory"]]
            assert lt == dt, (type(agent).__name__, k, lt, dt)
            assert (lock[k].get("midstop")
                    == dev[k].get("midstop")), (type(agent).__name__, k)
            assert (lock[k].get("predObjId")
                    == dev[k].get("predObjId")), (type(agent).__name__, k)
