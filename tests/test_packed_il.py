"""Packed IL training: assembly invariants, logits parity with the
unpacked episode scan, gradient equivalence of the packed update, and
the agent integration path.

The claim under test (agents/packing.py + rollout.py:
build_packed_il_forward): packing episodes back to back into scan slots
changes WHICH cells compute, not WHAT any episode computes — per-episode
logits equal the unpacked scan's and the packed IL update is the same
estimator (summed CE over the same (episode, step) cells / episode
count). The reference gets its padding savings by breaking the host
loop early (agent_cmt.py rollout loop); packing is the fixed-shape
device-scan equivalent.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_hamt_tpu.agents.agent import HAMTAgent
from vln_hamt_tpu.agents.losses import IGNORE_ID, il_loss
from vln_hamt_tpu.configs import HAMTConfig
from vln_hamt_tpu.env import ObsSpec, R2RNavEnv


def nodrop_cfg(world, max_action_len=8, batch_size=4, extra_model=None):
    """Tiny config with EVERY dropout off: forwards are then
    deterministic regardless of rng, so packed vs unpacked comparisons
    are exact-math comparisons."""
    feat_dim = world.feat_db.feat_dim
    max_deg = max(g.max_degree for g in world.graphs.values())
    return HAMTConfig().replace(
        model={
            **(extra_model or {}),
            "hidden_size": 64,
            "num_attention_heads": 4,
            "intermediate_size": 128,
            "num_l_layers": 2,
            "num_x_layers": 2,
            "num_h_pano_layers": 1,
            "image_feat_size": feat_dim,
            "vocab_size": 30522,
            "max_action_steps": 20,
            "max_position_embeddings": 64,
            "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0,
            "feat_dropout": 0.0,
            "pred_head_dropout_prob": 0.0,
            "critic_dropout": 0.0,
        },
        env={
            "max_action_len": max_action_len,
            "max_instr_len": 48,
            "max_candidates": max_deg,
            "image_feat_size": feat_dim,
        },
        train={"batch_size": batch_size, "lr": 1e-3, "ml_weight": 1.0},
    )


@pytest.fixture(scope="module")
def setup(tiny_world):
    cfg = nodrop_cfg(tiny_world)
    spec = ObsSpec(
        max_candidates=cfg.env.max_candidates,
        image_feat_size=cfg.env.image_feat_size,
    )
    env = R2RNavEnv(
        tiny_world.graphs, tiny_world.feat_db, tiny_world.instr_data, spec,
        batch_size=cfg.train.batch_size,
        max_instr_len=cfg.env.max_instr_len,
        max_action_len=cfg.env.max_action_len,
        seed=0,
    )
    agent = HAMTAgent(cfg, env, seed=0)
    agent.enable_feature_table()
    agent.enable_packed_il()
    pack = agent._packer.next_pack()
    return cfg, env, agent, pack


def unpack_to_episode_batch(pack, t_max, stop_slot, extra_int_keys=()):
    """Rebuild an unpacked (E, T) episode dict from a pack's cells —
    the oracle input for the unpacked scan. ``extra_int_keys`` names
    additional (S, T) int grids handled like ``teacher`` (REVERIE's
    ``ref_teacher``)."""
    n_eps = int(pack["n_episodes"])
    live = pack["live"]
    e_keys = ("node_idx", "view_index", "cand_point", "cand_ang")
    out = {
        "txt_ids": pack["txt_ids"][:n_eps],
        "txt_mask": pack["txt_mask"][:n_eps],
        "actions": np.full((n_eps, t_max), stop_slot, np.int32),
        "teacher": np.full((n_eps, t_max), IGNORE_ID, np.int32),
        "step_mask": np.zeros((n_eps, t_max), bool),
    }
    for k in extra_int_keys:
        out[k] = np.full((n_eps, t_max), IGNORE_ID, np.int32)
    for k in e_keys:
        shp = (n_eps, t_max) + pack[k].shape[2:]
        out[k] = np.zeros(shp, pack[k].dtype)
    lens = np.zeros(n_eps, np.int64)
    for e in range(n_eps):
        cells = np.argwhere((pack["ep_id"] == e) & live)
        assert len(cells) > 0
        slots = np.unique(cells[:, 0])
        assert len(slots) == 1, "episode spread over slots"
        s = int(slots[0])
        ts = np.sort(cells[:, 1])
        assert (np.diff(ts) == 1).all(), "episode cells not contiguous"
        l = len(ts)
        lens[e] = l
        t0 = int(ts[0])
        sl = np.s_[t0:t0 + l]
        for k in e_keys:
            out[k][e, :l] = pack[k][s][sl]
            # pad tail by repeating the final cell (same trick as
            # env._collect_episode_with_actions)
            out[k][e, l:] = out[k][e, l - 1:l]
        out["actions"][e, :l] = pack["actions"][s][sl]
        out["teacher"][e, :l] = pack["teacher"][s][sl]
        for k in extra_int_keys:
            out[k][e, :l] = pack[k][s][sl]
        out["step_mask"][e, :l] = True
        assert pack["is_start"][s, t0]
        np.testing.assert_array_equal(pack["local_t"][s][sl], np.arange(l))
    return {k: jnp.asarray(v) for k, v in out.items()}, lens


def test_pack_assembly_invariants(setup):
    cfg, env, agent, pack = setup
    n_eps = int(pack["n_episodes"])
    assert n_eps > env.batch_size, (
        "packing should fit more episodes than the plain batch "
        f"(got {n_eps} vs batch {env.batch_size})")
    # every placed episode's cells decode cleanly (asserts inside)
    _, lens = unpack_to_episode_batch(pack, env.max_action_len,
                                      env.spec.stop_slot)
    assert int(pack["live"].sum()) == int(lens.sum())
    # dead cells never contribute to the CE
    assert (pack["teacher"][~pack["live"]] == IGNORE_ID).all()
    # each episode that ended within the horizon ends with its STOP
    for e in range(n_eps):
        cells = np.argwhere((pack["ep_id"] == e) & pack["live"])
        s, t_last = cells[np.argmax(cells[:, 1])]
        if len(cells) < env.max_action_len:
            assert pack["actions"][s, t_last] == env.spec.stop_slot


def test_packed_logits_match_unpacked(setup):
    cfg, env, agent, pack = setup
    t_max = env.max_action_len
    ep, lens = unpack_to_episode_batch(pack, t_max, env.spec.stop_slot)
    rng = jax.random.PRNGKey(7)

    packed_logits = np.asarray(agent._packed_il_forward(
        agent.state.params, jax.tree.map(jnp.asarray, pack), rng,
        deterministic=True, feat_table=agent._feat_table))  # (T, S, N)
    out = agent.episode_forward(
        agent.state.params, agent.state.cparams, ep, rng,
        deterministic=True, feat_table=agent._feat_table)
    unpacked_logits = np.asarray(out.logits)  # (T, E, N)

    n_eps = int(pack["n_episodes"])
    checked = 0
    for e in range(n_eps):
        cells = np.argwhere((pack["ep_id"] == e) & pack["live"])
        s = int(cells[0, 0])
        ts = np.sort(cells[:, 1])
        for k, t in enumerate(ts):
            a = packed_logits[t, s]
            b = unpacked_logits[k, e]
            finite = np.isfinite(a) & np.isfinite(b)
            assert (np.isfinite(a) == np.isfinite(b)).all()
            np.testing.assert_allclose(a[finite], b[finite],
                                       rtol=1e-4, atol=1e-4)
            checked += 1
    assert checked == int(lens.sum())


def test_packed_update_matches_unpacked_grads(setup):
    """grad of (packed CE / n_episodes) == grad of the unpacked
    _il_loss over the same episodes (which divides by ITS batch size =
    the episode count) — the packed update is the same estimator."""
    cfg, env, agent, pack = setup
    t_max = env.max_action_len
    ep, _ = unpack_to_episode_batch(pack, t_max, env.spec.stop_slot)
    rng = jax.random.PRNGKey(3)
    pack_dev = jax.tree.map(jnp.asarray, pack)

    def packed_loss(params):
        return agent._packed_il_loss(params, pack_dev, rng, 1.0,
                                     agent._feat_table)[0]

    def unpacked_loss(params):
        return agent._il_loss(params, agent.state.cparams, ep, rng, 1.0,
                              agent._feat_table)[0]

    lp, gp = jax.value_and_grad(packed_loss)(agent.state.params)
    lu, gu = jax.value_and_grad(unpacked_loss)(agent.state.params)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-5)
    flat_p, _ = jax.tree_util.tree_flatten(gp)
    flat_u, _ = jax.tree_util.tree_flatten(gu)
    for a, b in zip(flat_p, flat_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_agent_packed_training_runs(setup):
    cfg, env, agent, pack = setup
    consumed0 = agent._packer.episodes_consumed
    outs = [agent.train_iteration("teacher") for _ in range(3)]
    assert all(np.isfinite(o["loss"]) for o in outs)
    assert all(o["episodes"] > 0 for o in outs)
    # packing must beat the unpacked episodes-per-update rate overall
    total = sum(o["episodes"] for o in outs)
    assert total > len(outs) * env.batch_size, total
    assert agent._packer.episodes_consumed - consumed0 == total


def test_packed_env_alternation(setup, tiny_world):
    """GT/aug alternation (the reference interval loop swaps
    ``listner.env`` each iteration, main.py:146-161): packers are
    per-env, so each env's episode queue stays separate and the one
    compiled program serves both (same shapes)."""
    cfg, env, agent, pack = setup
    env2 = R2RNavEnv(
        tiny_world.graphs, tiny_world.feat_db, tiny_world.instr_data,
        env.spec, batch_size=cfg.train.batch_size,
        max_instr_len=cfg.env.max_instr_len,
        max_action_len=cfg.env.max_action_len, seed=99,
    )
    env2.feat_offsets = env.feat_offsets
    base_env = agent.env
    try:
        outs = []
        for j in range(4):
            agent.env = base_env if j % 2 == 0 else env2
            outs.append(agent.train_iteration("teacher"))
        assert all(np.isfinite(o["loss"]) for o in outs)
        assert all(o["episodes"] > 0 for o in outs)
        # one packer per env object, both drained
        assert len(agent._packers) == 2
        assert all(p.episodes_consumed > 0
                   for p in agent._packers.values())
    finally:
        agent.env = base_env


# ---------------------------------------------------------------- REVERIE
@pytest.fixture(scope="module")
def rsetup():
    """Tiny REVERIE agent with packed IL enabled (dual-target packs)."""
    from vln_hamt_tpu.agents.reverie import ReverieAgent
    from vln_hamt_tpu.data.fixtures import (add_synthetic_objects,
                                            make_synthetic_world)
    from vln_hamt_tpu.env import ReverieNavEnv

    world = make_synthetic_world(num_scans=1, nodes_per_scan=12,
                                 num_items=8, feat_dim=32, seed=1)
    obj_db, obj2vp = add_synthetic_objects(world, obj_feat_size=24, seed=1)
    cfg = nodrop_cfg(world, extra_model={"obj_feat_size": 24})
    spec = ObsSpec(max_candidates=cfg.env.max_candidates,
                   image_feat_size=cfg.env.image_feat_size)
    env = ReverieNavEnv(
        world.graphs, world.feat_db, world.instr_data, spec,
        batch_size=cfg.train.batch_size,
        max_instr_len=cfg.env.max_instr_len,
        max_action_len=cfg.env.max_action_len,
        seed=0, obj_db=obj_db, obj2viewpoint=obj2vp,
        max_objects=4, obj_feat_size=24,
    )
    agent = ReverieAgent(cfg, env, seed=0)
    agent.enable_feature_table()
    agent.enable_packed_il()
    pack = agent._packer.next_pack()
    return cfg, env, agent, pack


def test_reverie_pack_carries_dual_targets(rsetup):
    cfg, env, agent, pack = rsetup
    n_eps = int(pack["n_episodes"])
    assert n_eps > env.batch_size
    # dead cells contribute to neither CE
    assert (pack["teacher"][~pack["live"]] == IGNORE_ID).all()
    assert (pack["ref_teacher"][~pack["live"]] == IGNORE_ID).all()
    # each episode's last live cell is the obj-stop action with a live
    # grounded-object target (the synthetic objId is always present at
    # the goal viewpoint)
    for e in range(n_eps):
        cells = np.argwhere((pack["ep_id"] == e) & pack["live"])
        s, t_last = cells[np.argmax(cells[:, 1])]
        if len(cells) < env.max_action_len:
            assert pack["actions"][s, t_last] == agent.ref_stop
            assert pack["ref_teacher"][s, t_last] != IGNORE_ID


def test_reverie_packed_update_matches_unpacked_grads(rsetup):
    """grad of the packed dual CE / n_episodes == grad of the unpacked
    _ref_il_loss over the same episodes (which divides by ITS batch
    size = the episode count)."""
    cfg, env, agent, pack = rsetup
    t_max = env.max_action_len
    ep, _ = unpack_to_episode_batch(pack, t_max, agent.ref_stop,
                                    extra_int_keys=("ref_teacher",))
    rng = jax.random.PRNGKey(5)
    pack_dev = jax.tree.map(jnp.asarray, pack)

    def packed_loss(params):
        return agent._packed_il_loss(params, pack_dev, rng, 1.0,
                                     agent._feat_table,
                                     agent._obj_tables)[0]

    def unpacked_loss(params):
        return agent._ref_il_loss(params, agent.state.cparams, ep, rng,
                                  1.0, agent._feat_table,
                                  agent._obj_tables)[0]

    lp, gp = jax.value_and_grad(packed_loss)(agent.state.params)
    lu, gu = jax.value_and_grad(unpacked_loss)(agent.state.params)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-5)
    flat_p, _ = jax.tree_util.tree_flatten(gp)
    flat_u, _ = jax.tree_util.tree_flatten(gu)
    for a, b in zip(flat_p, flat_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_reverie_agent_packed_training_runs(rsetup):
    cfg, env, agent, pack = rsetup
    outs = [agent.train_iteration("teacher") for _ in range(2)]
    assert all(np.isfinite(o["loss"]) for o in outs)
    total = sum(o["episodes"] for o in outs)
    assert total > len(outs) * env.batch_size, total


# ------------------------------------------------------------- variants
@pytest.mark.slow
@pytest.mark.parametrize("task", ["r2rback", "cvdn"])
def test_variant_agents_packed_training(task):
    """R2R-Back and CVDN ride the BASE packed path unchanged: their
    teacher episodes come from the env (R2RNavEnv.teacher_episode with
    task-specific teacher logic inside the env), so the packer slices
    and the packed scan trains them like R2R."""
    from vln_hamt_tpu.agents import CVDNAgent, R2RBackAgent
    from vln_hamt_tpu.data.fixtures import (make_synthetic_cvdn_items,
                                            make_synthetic_r2rback_items,
                                            make_synthetic_world)
    from vln_hamt_tpu.env import CVDNNavEnv, R2RBackNavEnv

    world = make_synthetic_world(num_scans=1, nodes_per_scan=12,
                                 num_items=8, feat_dim=32, seed=3)
    if task == "r2rback":
        items = make_synthetic_r2rback_items(world)
        cfg = nodrop_cfg(world, max_action_len=16)
        env_cls, agent_cls = R2RBackNavEnv, R2RBackAgent
    else:
        items = make_synthetic_cvdn_items(world)
        cfg = nodrop_cfg(world, max_action_len=10)
        env_cls, agent_cls = CVDNNavEnv, CVDNAgent
    spec = ObsSpec(max_candidates=cfg.env.max_candidates,
                   image_feat_size=cfg.env.image_feat_size)
    env = env_cls(world.graphs, world.feat_db, items, spec,
                  batch_size=cfg.train.batch_size,
                  max_instr_len=cfg.env.max_instr_len,
                  max_action_len=cfg.env.max_action_len, seed=0)
    agent = agent_cls(cfg, env, seed=0)
    agent.enable_feature_table()
    agent.enable_packed_il()
    outs = [agent.train_iteration("teacher") for _ in range(2)]
    assert all(np.isfinite(o["loss"]) for o in outs)
    total = sum(o["episodes"] for o in outs)
    assert total > len(outs) * env.batch_size, total
