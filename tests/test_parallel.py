import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from vln_hamt_tpu.parallel.mesh import (
    make_mesh,
    param_partition_spec,
    replicate,
    shard_batch,
    shard_params,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(num_data=4, num_model=2)


def test_mesh_shape(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def test_partition_rules():
    w = np.zeros((64, 128))
    assert param_partition_spec("x_layer_0/visn_ffn/intermediate/kernel", w) == P(None, "model")
    assert param_partition_spec("x_layer_0/visn_ffn/output/kernel", w) == P("model", None)
    assert param_partition_spec("lang_layers/layer_0/attention/att/query/kernel", w) == P(None, "model")
    assert param_partition_spec("lang_layers/layer_0/attention/output/dense/kernel", w) == P("model", None)
    # biases / LN replicated
    assert param_partition_spec("anything/bias", np.zeros((64,))) == P()
    # embeddings replicated
    assert param_partition_spec("embeddings/word_embeddings/embedding", np.zeros((100, 64))) == P()


def test_shard_batch_and_params(mesh8):
    batch = {"x": np.ones((8, 3), np.float32), "y": np.zeros((8,), np.int32)}
    sb = shard_batch(batch, mesh8)
    assert sb["x"].sharding.spec == P("data")

    params = {"ffn": {"intermediate": {"kernel": np.ones((64, 128), np.float32)}},
              "ln": {"scale": np.ones((64,), np.float32)}}
    sp = shard_params(params, mesh8)
    assert sp["ffn"]["intermediate"]["kernel"].sharding.spec == P(None, "model")
    assert sp["ln"]["scale"].sharding.spec == P()


def test_sharded_matmul_correctness(mesh8):
    """A data+tensor sharded computation must equal the single-device one."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 64)).astype(np.float32)
    w = rng.standard_normal((64, 128)).astype(np.float32)
    want = np.maximum(x @ w, 0).sum(axis=1)

    from jax.sharding import NamedSharding

    xs = jax.device_put(x, NamedSharding(mesh8, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh8, P(None, "model")))
    f = jax.jit(lambda x, w: jnp.maximum(x @ w, 0).sum(axis=1))
    got = np.asarray(f(xs, ws))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_pretrain_step(mesh8):
    """Proxy-task pretraining over the mesh: one MLM update, sharded
    batch over 'data' and TP params over 'model', must produce finite
    loss and match the replicated result within tolerance."""
    import optax

    from vln_hamt_tpu.configs import ModelConfig
    from vln_hamt_tpu.data.fixtures import make_synthetic_world
    from vln_hamt_tpu.pretrain import (
        PretrainBatcher,
        TrajectoryDataset,
        make_synthetic_trajectories,
    )
    from vln_hamt_tpu.pretrain.model import init_pretrain_params

    cfg = ModelConfig(hidden_size=64, num_attention_heads=4,
                      intermediate_size=128, num_l_layers=2, num_x_layers=2,
                      num_h_pano_layers=1, image_feat_size=32,
                      image_prob_size=16, max_position_embeddings=64,
                      max_action_steps=16)
    world = make_synthetic_world(num_scans=1, nodes_per_scan=12, num_items=10,
                                 feat_dim=48, seed=2)
    ds = TrajectoryDataset(make_synthetic_trajectories(world), world.graphs,
                           world.feat_db, image_feat_size=32,
                           image_prob_size=16, max_txt_len=32, max_hist_len=6)
    batcher = PretrainBatcher(ds, seed=0, vocab_mask_range=(1000, 2000))

    model, params = init_pretrain_params(cfg, jax.random.key(0),
                                         max_hist_len=6, instr_len=32)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    batch = {k: jnp.asarray(v) for k, v in batcher.batch("mlm", 8).items()}

    # reference loss first: the sharded step donates its param buffers
    def loss_fn(p):
        l, _ = model.apply({"params": p}, batch, "mlm",
                           deterministic=False,
                           rngs={"dropout": jax.random.key(1)})
        return l

    loss_ref = float(loss_fn(params))

    # the sharded update as the trainer compiles it: inputs carry the
    # shardings, GSPMD inserts the grad all-reduce
    @jax.jit
    def step(p, o, b, rng):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: model.apply({"params": p}, b, "mlm",
                                  deterministic=False,
                                  rngs={"dropout": rng}),
            has_aux=True)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, aux

    sp = shard_params(params, mesh8)
    sb = shard_batch(batch, mesh8)
    p2, o2, loss, aux = step(sp, shard_params(opt_state, mesh8), sb,
                             jax.random.key(1))
    assert np.isfinite(float(loss))
    del p2, o2, aux
    np.testing.assert_allclose(float(loss), loss_ref, rtol=2e-3)


def test_pretrain_trainer_on_mesh(mesh8):
    """PretrainTrainer(mesh=...) must train every task under dp+tp —
    including ITM, whose batch has non-batch-leading leaves that must
    replicate rather than shard."""
    from vln_hamt_tpu.configs import ModelConfig
    from vln_hamt_tpu.data.fixtures import make_synthetic_world
    from vln_hamt_tpu.pretrain import (
        PretrainBatcher,
        PretrainTrainer,
        TrajectoryDataset,
        make_synthetic_trajectories,
    )

    cfg = ModelConfig(hidden_size=64, num_attention_heads=4,
                      intermediate_size=128, num_l_layers=2, num_x_layers=2,
                      num_h_pano_layers=1, image_feat_size=32,
                      image_prob_size=16, max_position_embeddings=64,
                      max_action_steps=16)
    world = make_synthetic_world(num_scans=1, nodes_per_scan=12, num_items=10,
                                 feat_dim=48, seed=2)
    ds = TrajectoryDataset(make_synthetic_trajectories(world), world.graphs,
                           world.feat_db, image_feat_size=32,
                           image_prob_size=16, max_txt_len=32, max_hist_len=6)
    batcher = PretrainBatcher(ds, seed=0, vocab_mask_range=(1000, 2000))
    trainer = PretrainTrainer(cfg, batcher, tasks=("itm", "mlm"),
                              mix_ratio=(1, 1), batch_size=8, lr=1e-3,
                              warmup_steps=2, total_steps=50, mesh=mesh8)
    seen = set()
    for _ in range(4):
        task, loss, aux = trainer.train_step()
        seen.add(task)
        assert np.isfinite(loss), task
    assert "itm" in seen or "mlm" in seen


def _tiny_mesh_agent(world, batch=8, table=True, max_action_len=6):
    from vln_hamt_tpu.agents import HAMTAgent
    from vln_hamt_tpu.configs import HAMTConfig
    from vln_hamt_tpu.env import ObsSpec, R2RNavEnv

    feat_dim = world.feat_db.feat_dim
    max_deg = max(g.max_degree for g in world.graphs.values())
    cfg = HAMTConfig().replace(
        model={"hidden_size": 64, "num_attention_heads": 4,
               "intermediate_size": 128, "num_l_layers": 2,
               "num_x_layers": 2, "num_h_pano_layers": 1,
               "image_feat_size": feat_dim, "max_position_embeddings": 64,
               "max_action_steps": 16},
        env={"max_action_len": max_action_len, "max_instr_len": 48,
             "max_candidates": max_deg, "image_feat_size": feat_dim},
        train={"batch_size": batch, "lr": 1e-3, "ml_weight": 1.0},
    )
    spec = ObsSpec(max_candidates=max_deg, image_feat_size=feat_dim)
    env = R2RNavEnv(world.graphs, world.feat_db, world.instr_data, spec,
                    batch_size=batch, max_instr_len=48,
                    max_action_len=max_action_len, seed=0)
    agent = HAMTAgent(cfg, env, seed=0)
    if table:
        agent.enable_feature_table(env)
    return env, agent


def test_mesh_agent_il_parity(tiny_world):
    """Mesh-sharded fine-tune IL updates must match single-device ones:
    identical agents/envs/seeds, one on a data=8 mesh, same losses."""
    losses = {}
    for meshed in (False, True):
        env, agent = _tiny_mesh_agent(tiny_world)
        if meshed:
            agent.enable_mesh(make_mesh(num_data=8, num_model=1))
        losses[meshed] = [agent.train_iteration("teacher")["IL_loss"]
                          for _ in range(3)]
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-4, atol=1e-6)


def test_mesh_device_rollout_and_eval_parity(tiny_world):
    """The device RL rollout and packed greedy eval under a data mesh
    must reproduce the single-device trajectories exactly (per-row
    computations are batch-independent; only reductions could differ,
    and there are none across the batch)."""
    outs = {}
    for meshed in (False, True):
        env, agent = _tiny_mesh_agent(tiny_world)
        if meshed:
            agent.enable_mesh(make_mesh(num_data=8, num_model=1))
        ep, extras = agent.device_rollout_iteration(jax.random.PRNGKey(7))
        preds = agent.eval_split_packed(env, pipeline=1)
        outs[meshed] = (
            np.asarray(ep["actions"]),
            np.asarray(extras["rewards"]),
            {p["instr_id"]: [tuple(x) for x in p["trajectory"]]
             for p in preds},
        )
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=1e-5, atol=1e-6)
    assert outs[True][2] == outs[False][2]


def test_mesh_agent_tp_sample_step(tiny_world):
    """Full 'sample' iteration (IL + device rollout + RL replay) under
    dp x tp: finite losses and a checkpoint round-trip onto the mesh."""
    import os
    import tempfile

    env, agent = _tiny_mesh_agent(tiny_world)
    agent.enable_mesh(make_mesh(num_data=4, num_model=2))
    out = agent.train_iteration("sample")
    assert np.isfinite(out["loss"]) and np.isfinite(out["RL_loss"])
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pkl")
        agent.save(path)
        step = agent.load(path, resume_optimizer=True)
        assert step == agent.state.step
    out2 = agent.train_iteration("teacher")
    assert np.isfinite(out2["loss"])


def test_dryrun_multichip_entry():
    """The driver-facing multi-chip dryrun must run end to end."""
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
