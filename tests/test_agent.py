import dataclasses

import jax
import numpy as np
import pytest

from vln_hamt_tpu.configs import HAMTConfig
from vln_hamt_tpu.env import ObsSpec, R2RNavEnv
from vln_hamt_tpu.agents.agent import HAMTAgent


def tiny_cfg(world, max_action_len=8, batch_size=4):
    feat_dim = world.feat_db.feat_dim
    max_deg = max(g.max_degree for g in world.graphs.values())
    return HAMTConfig().replace(
        model={
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
            "feat_dropout": 0.1,
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
    cfg = tiny_cfg(tiny_world)
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
    return cfg, env, agent


def test_teacher_training_reduces_loss(setup):
    cfg, env, agent = setup
    losses = [agent.train_iteration("teacher")["loss"] for _ in range(12)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_sample_feedback_step_runs(setup):
    cfg, env, agent = setup
    out = agent.train_iteration("sample")
    assert np.isfinite(out["loss"])
    assert "RL_loss" in out and "IL_loss" in out
    assert np.isfinite(out["RL_loss"])


def test_rl_replay_matches_rollout_logits(setup):
    """The cornerstone of the rollout-then-replay design: replayed logits
    must equal the rollout's sampled-from logits so policy gradients are
    computed under the exact rollout distribution."""
    cfg, env, agent = setup
    rng = jax.random.PRNGKey(123)
    _, extras = agent.interactive_rollout(
        "sample", rng, deterministic=False, record_for_replay=True
    )
    out = agent.episode_forward(
        agent.state.params, agent.state.cparams, extras["ep"], rng,
        deterministic=False,
    )
    t_used = extras["rollout_logits"].shape[0]
    replay = np.asarray(out.logits)[:t_used]
    rollout = extras["rollout_logits"]
    finite = np.isfinite(rollout)
    np.testing.assert_allclose(replay[finite], rollout[finite],
                               rtol=2e-4, atol=2e-4)
    # masked entries stay masked
    assert np.all(replay[~finite] == -np.inf)


def test_feature_table_il_matches_plain(tiny_world):
    """Device-resident feature-table transport (ship (B,T) node indices,
    gather on device) must produce bit-identical IL updates."""
    cfg = tiny_cfg(tiny_world)
    spec = ObsSpec(max_candidates=cfg.env.max_candidates,
                   image_feat_size=cfg.env.image_feat_size)

    def make(table):
        env = R2RNavEnv(
            tiny_world.graphs, tiny_world.feat_db, tiny_world.instr_data,
            spec, batch_size=cfg.train.batch_size,
            max_instr_len=cfg.env.max_instr_len,
            max_action_len=cfg.env.max_action_len, seed=0)
        agent = HAMTAgent(cfg, env, seed=0)
        if table:
            agent.enable_feature_table()
        return env, agent

    env, _ = make(True)  # schema probe on a throwaway env
    ep = env.teacher_episode()
    assert ep.pano_feat is None and ep.node_idx is not None
    assert ep.node_idx.dtype == np.int32

    losses = {}
    for table in (False, True):
        _, agent = make(table)
        # pin the rollout-then-replay path: without the table there are
        # no nav tables so the fused one-program update is unavailable;
        # the comparison must isolate the TRANSPORT (fused-vs-replay
        # parity is covered by test_device_rollout_matches_host)
        agent.fused_sample_update = False
        out = [float(agent.train_iteration("teacher")["loss"])
               for _ in range(3)]
        # one IL+RL iteration: rollout policy steps + replay must also be
        # table-invariant
        rl = agent.train_iteration("sample")
        out += [float(rl["loss"]), float(rl["RL_loss"])]
        losses[table] = out
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-6)


def test_device_rollout_matches_host(tiny_world):
    """The fully device-resident RL sampling rollout (one lax.scan with
    nav-table transitions + in-scan nDTW rewards) must reproduce the
    host rollout exactly: logits, actions, visited nodes, rewards,
    masks, bootstrap, and the resulting IL+RL updates."""
    cfg = tiny_cfg(tiny_world)
    spec = ObsSpec(max_candidates=cfg.env.max_candidates,
                   image_feat_size=cfg.env.image_feat_size)

    def make():
        env = R2RNavEnv(
            tiny_world.graphs, tiny_world.feat_db, tiny_world.instr_data,
            spec, batch_size=cfg.train.batch_size,
            max_instr_len=cfg.env.max_instr_len,
            max_action_len=cfg.env.max_action_len, seed=0)
        agent = HAMTAgent(cfg, env, seed=0)
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
                                      np.asarray(host["ep"][k]))
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

    # the fused one-program update (IL + rollout-with-grad + A2C, no
    # replay forward) must produce the same losses as rollout-then-
    # replay: the replay is bit-identical to the rollout by the shared
    # fold_in keys, so differentiating through the rollout is the same
    # estimator
    a5 = make()
    a5.fused_sample_update = False
    two = [float(a5.train_iteration("sample")["loss"]) for _ in range(2)]
    np.testing.assert_allclose(two, d, rtol=2e-5)


def test_merged_sample_update(tiny_world):
    """The merged single-scan 'sample' update (IL replay as extra
    teacher-forced lanes of the rollout scan, PARITY.md #18): with
    dropout OFF the IL lanes must reproduce episode_forward's logits
    exactly; with dropout on, training must run to finite losses."""
    import jax.numpy as jnp

    cfg = tiny_cfg(tiny_world)
    spec = ObsSpec(max_candidates=cfg.env.max_candidates,
                   image_feat_size=cfg.env.image_feat_size)

    def make():
        env = R2RNavEnv(
            tiny_world.graphs, tiny_world.feat_db, tiny_world.instr_data,
            spec, batch_size=cfg.train.batch_size,
            max_instr_len=cfg.env.max_instr_len,
            max_action_len=cfg.env.max_action_len, seed=0)
        agent = HAMTAgent(cfg, env, seed=0)
        agent.enable_feature_table()
        return agent

    a = make()
    a.merged_sample_update = True
    out = [a.train_iteration("sample") for _ in range(2)]
    assert np.isfinite([o["loss"] for o in out]).all()
    assert np.isfinite([o["RL_loss"] for o in out]).all()

    # deterministic IL-lane parity vs episode_forward
    b = make()
    il_ep = b._ep_to_device(b.env.teacher_episode())
    b._ensure_device_rollout_fn()
    ins, tkeys = b._device_rollout_args()
    il = {k: il_ep[k] for k in ("node_idx", "view_index", "actions",
                                "step_mask")}
    txt_ids = jnp.concatenate([ins["txt_ids"], il_ep["txt_ids"]], 0)
    txt_mask = jnp.concatenate([ins["txt_mask"], il_ep["txt_mask"]], 0)
    rng = jax.random.PRNGKey(7)
    _, extras = b._device_rollout_fn.raw(
        b.state.params, b.state.cparams, txt_ids, txt_mask, rng,
        b._feat_table, b._nav_tables, ins["start_node"], ins["start_view"],
        ins["offs"], {k: ins[k] for k in tkeys},
        deterministic=True, compute_bootstrap=True, il=il)
    ref = b.episode_forward(b.state.params, b.state.cparams, il_ep, rng,
                            deterministic=True, feat_table=b._feat_table)
    got, want = np.asarray(extras["il_logits"]), np.asarray(ref.logits)
    fin = np.isfinite(want)
    assert got.shape == want.shape
    np.testing.assert_allclose(got[fin], want[fin], rtol=2e-4, atol=2e-4)
    assert np.array_equal(np.isfinite(got), fin)


def test_rl_replay_parity_with_pallas_dropout(tiny_world):
    """In-kernel attention dropout (ops/attention.py) must preserve the
    replay-parity invariant: the policy-step and scan-replay programs
    derive identical per-module dropout seeds from the same step rng."""
    cfg = tiny_cfg(tiny_world).replace(model={"use_pallas_attention": True})
    assert cfg.model.attention_probs_dropout_prob > 0.0
    spec = ObsSpec(max_candidates=cfg.env.max_candidates,
                   image_feat_size=cfg.env.image_feat_size)
    env = R2RNavEnv(
        tiny_world.graphs, tiny_world.feat_db, tiny_world.instr_data, spec,
        batch_size=cfg.train.batch_size,
        max_instr_len=cfg.env.max_instr_len,
        max_action_len=cfg.env.max_action_len,
        seed=0,
    )
    agent = HAMTAgent(cfg, env, seed=0)
    rng = jax.random.PRNGKey(7)
    _, extras = agent.interactive_rollout(
        "sample", rng, deterministic=False, record_for_replay=True
    )
    out = agent.episode_forward(
        agent.state.params, agent.state.cparams, extras["ep"], rng,
        deterministic=False,
    )
    t_used = extras["rollout_logits"].shape[0]
    replay = np.asarray(out.logits)[:t_used]
    rollout = extras["rollout_logits"]
    finite = np.isfinite(rollout)
    np.testing.assert_allclose(replay[finite], rollout[finite],
                               rtol=2e-4, atol=2e-4)
    assert np.all(replay[~finite] == -np.inf)


def test_eval_split_covers_all_items(setup):
    cfg, env, agent = setup
    preds = agent.eval_split()
    instr_ids = {p["instr_id"] for p in preds}
    assert instr_ids == {it["instr_id"] for it in env.data}
    agg, _ = env.eval_metrics(preds)
    assert 0.0 <= agg["sr"] <= 100.0
    assert np.isfinite(agg["nDTW"])


def test_packed_eval_matches_lockstep(setup):
    """Continuation-packed eval must produce the SAME greedy
    trajectories as the lock-step evaluator (policy is deterministic)."""
    cfg, env, agent = setup
    lock = {p["instr_id"]: [x[0] for x in p["trajectory"]]
            for p in agent.eval_split()}
    packed = {p["instr_id"]: [x[0] for x in p["trajectory"]]
              for p in agent.eval_split_packed()}  # pipeline=2 default
    assert len(env.data) >= 2 * env.batch_size, "pipeline must engage"
    assert set(lock) == set(packed)
    mismatches = {k for k in lock if lock[k] != packed[k]}
    assert not mismatches, (mismatches, {k: (lock[k], packed[k])
                                         for k in list(mismatches)[:2]})
    # single-group path must agree too
    packed1 = {p["instr_id"]: [x[0] for x in p["trajectory"]]
               for p in agent.eval_split_packed(pipeline=1)}
    assert packed1 == packed


def test_device_eval_matches_lockstep(tiny_world):
    """Fully device-resident greedy eval (one scan per batch,
    eval_split_device) must reproduce the lock-step evaluator's poses
    exactly — viewpoints AND headings/elevations (decoded on host from
    the discretized view index)."""
    cfg = tiny_cfg(tiny_world)
    spec = ObsSpec(max_candidates=cfg.env.max_candidates,
                   image_feat_size=cfg.env.image_feat_size)
    env = R2RNavEnv(
        tiny_world.graphs, tiny_world.feat_db, tiny_world.instr_data, spec,
        batch_size=cfg.train.batch_size, max_instr_len=cfg.env.max_instr_len,
        max_action_len=cfg.env.max_action_len, seed=0)
    agent = HAMTAgent(cfg, env, seed=0)
    agent.enable_feature_table()
    lock = {p["instr_id"]: p["trajectory"] for p in agent.eval_split(env)}
    dev = {p["instr_id"]: p["trajectory"]
           for p in agent.eval_split_device(env)}
    assert set(lock) == set(dev)
    for k in lock:
        assert [x[0] for x in lock[k]] == [x[0] for x in dev[k]], k
        for (av, ah, ae), (bv, bh, be) in zip(lock[k], dev[k]):
            assert av == bv and abs(ah - bh) < 1e-6 and abs(ae - be) < 1e-6


def test_packed_eval_tiny_split(setup):
    """Splits smaller than a batch: slots are filled by cycling the
    items (_PackedEvalGroup.__init__) and the duplicate episodes
    resolve to the FIRST prediction — each item predicted exactly once,
    identical to the lock-step evaluator."""
    cfg, env, agent = setup
    items = list(env.data)[: env.batch_size - 1]
    small = env.clone_shell(items)
    lock = {p["instr_id"]: [x[0] for x in p["trajectory"]]
            for p in agent.eval_split(small)}
    packed = {p["instr_id"]: [x[0] for x in p["trajectory"]]
              for p in agent.eval_split_packed(small)}
    assert set(packed) == {it["instr_id"] for it in items}
    assert packed == lock


def test_save_load_roundtrip(setup, tmp_path):
    cfg, env, agent = setup
    path = str(tmp_path / "ckpt.pkl")
    agent.save(path)
    before = jax.tree.leaves(agent.state.params)[0].copy()
    agent.train_iteration("teacher")
    after = jax.tree.leaves(agent.state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    step = agent.load(path)
    restored = jax.tree.leaves(agent.state.params)[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(restored))


def test_orbax_checkpoint_roundtrip(setup, tmp_path):
    cfg, env, agent = setup
    path = str(tmp_path / "orbax_ckpt")
    agent.save_orbax(path)
    before = np.asarray(jax.tree.leaves(agent.state.params)[0]).copy()
    # perturb, then restore
    agent.state.params = jax.tree.map(lambda x: x + 1.0, agent.state.params)
    step = agent.load_orbax(path)
    restored = np.asarray(jax.tree.leaves(agent.state.params)[0])
    np.testing.assert_array_equal(before, restored)


def test_orbax_async_checkpoint(setup, tmp_path):
    """Async orbax save: IO overlaps compute; wait_for_checkpoints
    commits; the restored tree matches the values AT save time (the
    snapshot must not see the post-save perturbation)."""
    cfg, env, agent = setup
    path = str(tmp_path / "orbax_async")
    before = np.asarray(jax.tree.leaves(agent.state.params)[0]).copy()
    agent.save_orbax(path, async_=True)
    # mutate immediately after the async save is dispatched
    agent.state.params = jax.tree.map(lambda x: x + 2.0, agent.state.params)
    agent.wait_for_checkpoints()
    agent.load_orbax(path)
    restored = np.asarray(jax.tree.leaves(agent.state.params)[0])
    np.testing.assert_array_equal(before, restored)


def test_incremental_ndtw_matches_full(tiny_world):
    from vln_hamt_tpu.eval.metrics import IncrementalNDTW, dtw_scores

    g = next(iter(tiny_world.graphs.values()))
    rng = np.random.default_rng(0)
    ref = rng.integers(0, g.num_nodes, 5).tolist()
    start = int(rng.integers(g.num_nodes))
    inc = IncrementalNDTW([g.dist], [ref], [start])
    path = [start]
    assert inc.value(0) == pytest.approx(dtw_scores(g.dist, path, ref)["nDTW"], rel=1e-6)
    for _ in range(6):
        node = int(rng.integers(g.num_nodes))
        path.append(node)
        inc.update(0, node)
        assert inc.value(0) == pytest.approx(
            dtw_scores(g.dist, path, ref)["nDTW"], rel=1e-6
        )
