"""Device meshes and shardings.

TPU-native replacement for the reference's distributed layer
(``finetune_src/utils/distributed.py``): instead of NCCL process groups,
DDP wrappers and pickled byte-tensor all_gathers, we lay out one
``jax.sharding.Mesh`` with axes ``('data', 'model')`` and let GSPMD
insert the collectives over ICI:

- data parallelism = batch sharded over 'data' (replaces DDP,
  distributed.py:57 + agent_cmt.py:54-56); gradient all-reduce is
  compiled into the jitted train step.
- tensor parallelism = weight matrices sharded over 'model'. The
  reference has no TP (SURVEY §2.3) — at 170M params it is not needed
  for memory, but the rules below make it a mesh-shape change rather
  than a rewrite, and the multi-chip dryrun exercises it.
- host-side result merging (pickled ``all_gather`` of eval dicts,
  distributed.py:90-130, main.py:254) becomes
  ``multihost_utils.process_allgather`` on python objects.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    assert num_data * num_model <= len(devices), (
        f"mesh {num_data}x{num_model} needs more than {len(devices)} devices"
    )
    grid = np.array(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(grid, axis_names=("data", "model"))


# Parameter partitioning rules for tensor parallelism. Matched against
# the '/'-joined flax param path. Column-parallel for D->4D / QKV
# projections, row-parallel for their output projections (Megatron
# layout): each transformer block needs only one all-reduce per
# sublayer, inserted automatically by GSPMD.
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # FFN
    (r".*/intermediate/kernel$", P(None, "model")),
    (r".*ffn/output/kernel$", P("model", None)),
    # attention projections
    (r".*/(query|key|value)/kernel$", P(None, "model")),
    (r".*/output/dense/kernel$", P("model", None)),
)


def param_partition_spec(path: str, value: Any) -> P:
    if getattr(value, "ndim", 0) == 2:
        for pattern, spec in _TP_RULES:
            if re.match(pattern, path):
                return spec
    return P()  # replicated


def _flatten_path(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh according to the TP rules."""

    def place(path, value):
        spec = param_partition_spec(_flatten_path(path), value)
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh, batch_size: int = None):
    """Shard every leaf's leading (batch) axis over the 'data' axis.

    With ``batch_size`` given, leaves whose leading dim differs (e.g.
    the ITM batch's (n_shuffles, B, T) tables) are replicated instead.
    """
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def place(x):
        if (batch_size is not None
                and (getattr(x, "ndim", 0) == 0
                     or x.shape[0] != batch_size)):
            return jax.device_put(x, repl)
        return jax.device_put(x, data)

    return jax.tree.map(place, batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def process_feed_rows(mesh: Mesh, global_batch: int) -> Tuple[int, int]:
    """The [start, stop) global-batch rows this process OWNS under a
    ``P('data')`` sharding of ``global_batch`` rows.

    With host-sharded feeding each process assembles only these rows
    from its own env shard (the scalable multi-host layout — host env
    work divides across processes instead of replicating; the
    reference's per-rank DDP feeding, ``cvdn/main.py:42-49``). Requires
    this process's 'data'-axis blocks to be contiguous, which
    ``make_mesh``'s process-major device grid guarantees.
    """
    sharding = NamedSharding(mesh, P("data"))
    rows = sorted(
        idx[0].indices(global_batch)
        for dev, idx in sharding.devices_indices_map((global_batch,)).items()
        if dev.process_index == jax.process_index()
    )
    start, stop = rows[0][0], rows[0][1]
    for r in rows[1:]:
        if r[0] == stop:  # merge adjacent blocks
            stop = r[1]
        elif r[0] < stop:  # same block seen via another model-axis dev
            stop = max(stop, r[1])
        else:
            raise AssertionError(
                f"non-contiguous data-axis rows for process "
                f"{jax.process_index()}: {rows}")
    return int(start), int(stop)


def shard_batch_from_local(batch, mesh: Mesh, local_batch: int,
                           global_batch: int,
                           axes: Optional[Dict[str, int]] = None):
    """Assemble GLOBAL batch arrays from per-process LOCAL rows.

    Each process passes leaves of leading dim ``local_batch`` (its own
    :func:`process_feed_rows` rows); ``jax.make_array_from_process_local_data``
    stitches them into one ``P('data')``-sharded global array without
    any host replication or cross-host transfer of the data itself.
    Leaves whose leading dim differs are replicated and must be
    identical on every process (scalars, shared tables).

    ``axes`` maps dict keys whose BATCH dimension is not axis 0 (e.g.
    the ITM ``itm_shuffled_pos`` (K2, B, T) tables) to that axis; those
    leaves are stitched along it instead of replicated.
    """
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    axes = axes or {}

    def place_axis(x, axis):
        spec = [None] * x.ndim
        spec[axis] = "data"
        gshape = list(x.shape)
        gshape[axis] = global_batch
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*spec)), x, tuple(gshape))

    def place(key, x):
        x = np.asarray(x)
        if key in axes:
            return place_axis(x, axes[key])
        if x.ndim == 0 or x.shape[0] != local_batch:
            return jax.device_put(x, repl)
        return jax.make_array_from_process_local_data(
            data, x, (global_batch,) + x.shape[1:])

    if isinstance(batch, dict):
        return {k: (place(k, v) if not isinstance(v, dict)
                    else shard_batch_from_local(v, mesh, local_batch,
                                                global_batch, axes))
                for k, v in batch.items()}
    return jax.tree.map(lambda x: place(None, x), batch)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host runtime initialization.

    Replaces the reference's NCCL process-group setup with its
    file:// sync-file rendezvous and env-derived ranks
    (``finetune_src/utils/distributed.py:13-71``):
    ``jax.distributed.initialize`` uses a coordinator address (on TPU
    pods all arguments are auto-detected from the environment). No-op
    when already initialized or single-process.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process local run


def is_default_process() -> bool:
    """Rank-0 gating (reference ``is_default_gpu``, distributed.py:74-75)."""
    return jax.process_index() == 0


def reduce_dict_mean(scalars: Dict[str, float]) -> Dict[str, float]:
    """Average a dict of host scalars across processes (the reference's
    ``reduce_dict``, distributed.py:133-157). Single-process: identity."""
    if jax.process_count() == 1:
        return dict(scalars)
    gathered = host_allgather(scalars)
    keys = gathered[0].keys()
    return {k: float(np.mean([g[k] for g in gathered])) for k in keys}


def host_allgather(obj: Any) -> list:
    """Gather an arbitrary picklable python object from every process
    (single-process: ``[obj]``).

    The TPU twin of the reference's pickle -> padded ByteTensor ->
    ``dist.all_gather`` -> unpickle dance (distributed.py:90-130), which
    exists for exactly the same reason: eval predictions are rich
    python objects (instr_ids, trajectories of viewpoint strings), not
    tensors. ``process_allgather`` alone cannot carry them — it maps
    over pytree leaves and requires arrays — so we serialize first and
    gather fixed-width byte rows.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([blob.size], np.int64), tiled=False).reshape(-1)
    padded = np.zeros((int(sizes.max()),), np.uint8)
    padded[: blob.size] = blob
    rows = multihost_utils.process_allgather(padded, tiled=False)
    return [pickle.loads(rows[i, : int(sizes[i])].tobytes())
            for i in range(jax.process_count())]
