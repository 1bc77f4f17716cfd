"""remat_policy="dots" (ModelConfig) — selective rematerialization.

With ``dots_with_no_batch_dims_saveable`` the episode-scan step saves
matmul outputs across the remat boundary and recomputes only
elementwise/attention work in the backward. The recompute is
deterministic, so the IL and merged-'sample' updates must produce the
same losses/params as full remat — the policy is purely a
memory/throughput trade. (BASELINE.md measured it on the real chip:
a net loss at v5e-16GB production shapes, so "full" stays default.)
"""

import numpy as np
import pytest


def _tiny_agent(remat_policy, batch_size=4):
    from vln_hamt_tpu.agents.agent import HAMTAgent
    from vln_hamt_tpu.configs import get_preset
    from vln_hamt_tpu.data.fixtures import make_synthetic_world
    from vln_hamt_tpu.env import ObsSpec, R2RNavEnv

    cfg = get_preset("r2r").replace(
        model={"hidden_size": 64, "num_attention_heads": 4,
               "intermediate_size": 128, "num_l_layers": 2,
               "num_x_layers": 1, "num_h_pano_layers": 1,
               "image_feat_size": 32, "max_position_embeddings": 128,
               "max_action_steps": 32,
               "remat": True, "remat_policy": remat_policy},
        env={"max_action_len": 6, "max_instr_len": 16,
             "image_feat_size": 32},
        train={"batch_size": batch_size},
    )
    world = make_synthetic_world(num_scans=1, nodes_per_scan=10,
                                 num_items=2 * batch_size, feat_dim=32,
                                 seed=3)
    max_deg = max(g.max_degree for g in world.graphs.values())
    cfg = cfg.replace(env={"max_candidates": max_deg})
    spec = ObsSpec(max_candidates=max_deg, image_feat_size=32)
    env = R2RNavEnv(world.graphs, world.feat_db, world.instr_data, spec,
                    batch_size=batch_size,
                    max_instr_len=cfg.env.max_instr_len,
                    max_action_len=cfg.env.max_action_len, seed=3)
    agent = HAMTAgent(cfg, env, seed=3)
    agent.enable_feature_table()
    return agent


def _param_leaves(agent):
    import jax
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(
        agent.state.params)]


@pytest.mark.parametrize("feedback", ["teacher", "sample"])
def test_dots_policy_matches_full_remat(feedback):
    """Same seeds/envs, remat full vs dots: losses and post-update
    params agree (the recompute-vs-save choice cannot change values)."""
    agents = {p: _tiny_agent(p) for p in ("full", "dots")}
    losses, params = {}, {}
    for p, agent in agents.items():
        if feedback == "sample":
            agent.merged_sample_update = True
        out = agent.train_iteration(feedback)
        losses[p] = float(out["loss"])
        params[p] = _param_leaves(agent)
    assert np.isfinite(losses["full"])
    np.testing.assert_allclose(losses["full"], losses["dots"], rtol=1e-5)
    for a, b in zip(params["full"], params["dots"]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_unknown_policy_raises():
    from vln_hamt_tpu.configs import get_preset
    from vln_hamt_tpu.agents.rollout import remat_scan_body

    cfg = get_preset("r2r").replace(
        model={"remat": True, "remat_policy": "bogus"}).model
    with pytest.raises(ValueError, match="remat_policy"):
        remat_scan_body(lambda c, x: (c, x), cfg)


def test_cli_flag(tmp_path):
    """--remat --remat_policy dots through the real finetune CLI."""
    from vln_hamt_tpu.run.finetune import main

    main(["--task", "r2r", "--synthetic", "--tiny", "--remat",
          "--remat_policy", "dots", "--feedback", "teacher",
          "--iters", "2", "--log_every", "2",
          "--output_dir", str(tmp_path / "run")])
