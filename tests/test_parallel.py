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


def test_dryrun_multichip_entry():
    """The driver-facing multi-chip dryrun must run end to end."""
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
