import numpy as np
import pytest

from vln_hamt_tpu.env.observation import ObsSpec, teacher_slot
from vln_hamt_tpu.env.r2r_env import IGNORE_ID, R2RNavEnv
from vln_hamt_tpu.env.sim import GraphSimulator, snap_heading_to_view


def make_env(world, batch_size=4, max_candidates=14, max_action_len=10):
    spec = ObsSpec(max_candidates=max_candidates, image_feat_size=world.feat_db.feat_dim)
    return R2RNavEnv(
        world.graphs,
        world.feat_db,
        world.instr_data,
        spec,
        batch_size=batch_size,
        max_action_len=max_action_len,
        seed=0,
    )


def test_snap_heading():
    assert snap_heading_to_view(0.0) == 12
    assert snap_heading_to_view(np.pi) == 18
    assert snap_heading_to_view(-np.pi / 6) == 23


def test_sim_episode_and_move(world):
    scan = world.scans[0]
    g = world.graphs[scan]
    sim = GraphSimulator(world.graphs, 2)
    sim.new_episodes([scan, scan], [g.node_ids[0], g.node_ids[1]], [0.0, np.pi])
    st = sim.get_state(0)
    assert st.node == 0 and st.view_index == 12
    nbr = int(g.nbr_index[0, 0])
    pid = int(g.nbr_point_id[0, 0])
    sim.move(0, nbr, pid)
    assert sim.get_state(0).node == nbr
    assert sim.get_state(0).view_index == pid
    # moving to a non-neighbor raises
    far = next(i for i in range(g.num_nodes) if i != 0 and not g.adj[nbr, i])
    with pytest.raises(AssertionError):
        sim.move(0, far, 0)


def test_obs_layout(world):
    """The expanded fixed layout: candidates, STOP, masked panorama."""
    env = make_env(world, batch_size=2)
    obs = env.reset()
    c = env.spec.max_candidates
    for i in range(2):
        g = env.sim.graph(i)
        u = int(obs.node[i])
        deg = int((g.nbr_index[u] >= 0).sum())
        ft = env.feat_db.get(env.batch[i]["scan"], g.node_ids[u])
        # candidate slots
        assert (obs.ob_nav[i, :deg] == 1).all()
        assert (obs.ob_nav[i, deg:c] == 0).all()
        assert obs.ob_nav[i, c] == 2  # STOP
        assert obs.ob_mask[i, c]
        # candidate features = pano feature at the representative view
        pid0 = int(g.nbr_point_id[u, 0])
        np.testing.assert_array_equal(obs.ob_img[i, 0], ft[pid0])
        # claimed views masked out of the pano region
        claimed = set(g.nbr_point_id[u][g.nbr_index[u] >= 0].tolist())
        for v in range(36):
            assert obs.ob_mask[i, c + 1 + v] == (v not in claimed)
        assert obs.ob_mask[i].sum() == deg + 1 + 36 - len(claimed)
        # history feature = current-view feature
        np.testing.assert_array_equal(obs.hist_img[i],
                                      ft[int(obs.view_index[i])])


def test_cand_ob_type_masks_panorama(world):
    """ob_type='cand' (agent_cmt.py:153-171 ablation): only candidates
    and STOP are attendable; device and numpy expansions agree."""
    import jax.numpy as jnp

    from vln_hamt_tpu.agents.rollout import make_expand_obs
    from vln_hamt_tpu.env.observation import expand_obs_np

    env = make_env(world, batch_size=3)
    obs = env.reset()
    spec_cand = ObsSpec(max_candidates=env.spec.max_candidates,
                        image_feat_size=env.spec.image_feat_size,
                        ob_type="cand")
    full = expand_obs_np(spec_cand, obs.pano_feat, obs.view_index,
                         obs.cand_point, obs.cand_ang)
    c = spec_cand.max_candidates
    assert full.ob_mask[:, c + 1 :].sum() == 0
    for i in range(3):
        deg = int((obs.cand_point[i] >= 0).sum())
        assert full.ob_mask[i].sum() == deg + 1
    dev = make_expand_obs(36, spec_cand.angle_feat_size, "cand")(
        jnp.asarray(obs.pano_feat), jnp.asarray(obs.view_index),
        jnp.asarray(obs.cand_point), jnp.asarray(obs.cand_ang))
    np.testing.assert_array_equal(np.asarray(dev["ob_mask"]), full.ob_mask)


def test_device_expansion_matches_numpy(world):
    """expand_obs (jit) must equal expand_obs_np exactly."""
    import jax.numpy as jnp

    from vln_hamt_tpu.agents.rollout import make_expand_obs
    from vln_hamt_tpu.env.observation import expand_obs_np

    env = make_env(world, batch_size=3)
    obs = env.reset()
    full = expand_obs_np(env.spec, obs.pano_feat, obs.view_index,
                         obs.cand_point, obs.cand_ang)
    expand = make_expand_obs(36, env.spec.angle_feat_size)
    dev = expand(jnp.asarray(obs.pano_feat), jnp.asarray(obs.view_index),
                 jnp.asarray(obs.cand_point), jnp.asarray(obs.cand_ang))
    np.testing.assert_allclose(np.asarray(dev["ob_img"]), full.ob_img, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev["ob_ang"]), full.ob_ang, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(dev["ob_nav"]), full.ob_nav)
    np.testing.assert_array_equal(np.asarray(dev["ob_mask"]), full.ob_mask)
    np.testing.assert_allclose(np.asarray(dev["hist_img"]), full.hist_img,
                               atol=1e-6)


def test_teacher_slot():
    from vln_hamt_tpu.env.observation import IGNORE_ID

    cand = np.array([5, 7, -1, -1])
    assert teacher_slot(cand, 4, 7, 0) == 1
    assert teacher_slot(cand, 4, 0, 0) == 4  # STAY -> STOP slot
    # off the ground-truth schedule: teacher unreachable -> IGNORE
    assert teacher_slot(cand, 4, 9, 0) == IGNORE_ID


def test_env_reset_and_teacher_rollout(world):
    env = make_env(world)
    obs = env.reset()
    assert obs.ob_img.shape == (4, env.spec.num_ob_tokens, 768)
    # start node matches item path[0]
    for i, item in enumerate(env.batch):
        g = env.graphs[item["scan"]]
        assert obs.node[i] == g.index(item["path"][0])

    # follow teacher to the goal
    stop = env.spec.stop_slot
    for _ in range(env.max_action_len):
        a = obs.teacher.copy()
        if (a == stop).all():
            break
        obs = env.step(np.where(a == stop, -1, a), obs)
    for i, item in enumerate(env.batch):
        g = env.graphs[item["scan"]]
        assert obs.node[i] == g.index(item["path"][-1])
        assert obs.dist_to_goal[i] == 0.0


def test_teacher_episode_batch(world):
    env = make_env(world, batch_size=4, max_action_len=10)
    ep = env.teacher_episode()
    b, t = 4, 10
    assert ep.pano_feat.shape[:2] == (b, t)
    assert ep.view_index.shape == (b, t)
    assert ep.actions.shape == (b, t)
    # every item's ground truth path fits: steps = len(path)-1 moves + 1 stop
    for i, item in enumerate(env.batch):
        n_steps = len(item["path"])  # includes the stop step
        assert ep.step_mask[i].sum() == n_steps
        # teacher supervision present exactly on valid steps
        assert (ep.teacher[i, :n_steps] != IGNORE_ID).all()
        assert (ep.teacher[i, n_steps:] == IGNORE_ID).all()
        # last valid action is STOP
        assert ep.actions[i, n_steps - 1] == env.spec.stop_slot
    # actions equal teacher on valid steps
    np.testing.assert_array_equal(
        ep.actions[ep.step_mask], ep.teacher[ep.step_mask]
    )


def test_eval_metrics_teacher_path_is_perfect(world):
    env = make_env(world)
    env.reset()
    preds = [
        {"instr_id": it["instr_id"], "trajectory": list(it["path"])}
        for it in env.batch
    ]
    agg, _ = env.eval_metrics(preds)
    assert agg["sr"] == 100.0
    assert agg["spl"] == pytest.approx(100.0)
    assert agg["nDTW"] == pytest.approx(100.0)


def test_minibatch_wraparound(world):
    env = make_env(world, batch_size=5)
    seen = set()
    for _ in range(10):
        env._next_minibatch()
        seen.update(it["instr_id"] for it in env.batch)
    assert len(seen) == len(world.instr_data)
