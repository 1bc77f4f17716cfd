"""The hardware-RNG dropout knob (cfg.train.rng_impl / --rng_impl rbg).

rbg generates dropout mask bits with XLA's RngBitGenerator instead of
threefry (same distribution, different bit-stream; BASELINE.md measures
+40% IL / +30% 'sample' episodes/s on v5e). These tests pin the safety
contract around it:

- the rollout-then-replay 'sample' path REFUSES rbg (its replay
  regenerates the rollout's dropout masks in a different compiled
  program; only threefry guarantees identical bits cross-program),
- the merged single-program 'sample' update and the IL update train
  fine under rbg (finite losses),
- apply_rng_impl validates names and leaves threefry untouched.

Every test restores the default impl — the rest of the suite relies on
threefry bit-parity (PARITY.md #13).
"""

import jax
import numpy as np
import pytest

from vln_hamt_tpu.utils.misc import apply_rng_impl


@pytest.fixture
def restore_prng_impl():
    prev = jax.config.jax_default_prng_impl
    yield
    jax.config.update("jax_default_prng_impl", prev)


def _tiny_agent(batch_size=4):
    from vln_hamt_tpu.agents.agent import HAMTAgent
    from vln_hamt_tpu.configs import get_preset
    from vln_hamt_tpu.data.fixtures import make_synthetic_world
    from vln_hamt_tpu.env import ObsSpec, R2RNavEnv

    cfg = get_preset("r2r").replace(
        model={"hidden_size": 64, "num_attention_heads": 4,
               "intermediate_size": 128, "num_l_layers": 2,
               "num_x_layers": 1, "num_h_pano_layers": 1,
               "image_feat_size": 32, "max_position_embeddings": 128,
               "max_action_steps": 32},
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


def test_apply_rng_impl_validates(restore_prng_impl):
    apply_rng_impl("threefry2x32")  # no-op, never raises
    assert jax.config.jax_default_prng_impl == "threefry2x32"
    with pytest.raises(ValueError):
        apply_rng_impl("philox")
    apply_rng_impl("rbg")
    assert jax.config.jax_default_prng_impl == "rbg"


def test_replay_sample_path_refuses_rbg(restore_prng_impl):
    agent = _tiny_agent()
    agent.merged_sample_update = False
    agent.fused_sample_update = False
    apply_rng_impl("rbg")
    with pytest.raises(ValueError, match="threefry"):
        agent.train_iteration("sample")


def test_training_under_rbg(restore_prng_impl):
    """IL and the merged 'sample' update run under rbg (finite losses,
    params actually change). Keys are created AFTER the impl switch, as
    the CLIs do (apply_rng_impl before agent construction)."""
    apply_rng_impl("rbg")
    agent = _tiny_agent()
    assert agent._iter_rng.shape == (4,)  # raw rbg key
    out = agent.train_iteration("teacher")
    assert np.isfinite(out["loss"])
    agent.merged_sample_update = True
    out = agent.train_iteration("sample")
    assert np.isfinite(out["loss"])


def test_cli_flag_round_trip(restore_prng_impl, tmp_path):
    """--rng_impl rbg through the real finetune CLI (tiny, 2 iters)."""
    from vln_hamt_tpu.run.finetune import main

    main(["--task", "r2r", "--synthetic", "--tiny", "--rng_impl", "rbg",
          "--feedback", "teacher", "--iters", "2", "--log_every", "2",
          "--output_dir", str(tmp_path / "run")])
    assert jax.config.jax_default_prng_impl == "rbg"
