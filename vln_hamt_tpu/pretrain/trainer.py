"""Multi-task pretraining loop.

Parity target: ``pretrain_src/main_r2r.py:231-316`` (MetaLoader-driven
training with mix-ratio task sampling, gradient accumulation,
warmup-linear LR, periodic per-task validation) and
``pretrain_src/data/loader.py`` (MetaLoader). The same trainer drives
the end-to-end image model (``main_r2r_image.py:91-262``) by injecting
``model``/``params`` (HAMTImagePretrain) and an ImagePretrainBatcher.

TPU restructurings:
- the reference broadcasts the sampled task id from rank 0 over NCCL
  every step (loader.py:54-59); here the schedule is a pure function of
  (seed, step), identical on every host with zero communication.
- per-task jitted train steps (task string static) — six compiled
  programs total, each with one fixed batch shape.
- gradient accumulation via optax.MultiSteps instead of manual
  loss-division bookkeeping (main_r2r.py:243-251).
- GT/aug stream mixing (the reference's ``r2r_*``/``r2raug_*`` named
  dataloaders, main_r2r.py:40-92) via a second deterministic draw over
  named batchers.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import ModelConfig
from .model import init_pretrain_params
from .optim import build_pretrain_optimizer, warmup_linear_schedule
from .tasks import TASK_NAMES, PretrainBatcher


class TaskScheduler:
    """Deterministic mix-ratio task sampling (loader.py:18-59)."""

    def __init__(self, tasks: Sequence[str], mix_ratio: Sequence[float],
                 seed: int = 0):
        assert len(tasks) == len(mix_ratio)
        self.tasks = list(tasks)
        p = np.asarray(mix_ratio, np.float64)
        self.p = p / p.sum()
        self.seed = seed

    def sample(self, step: int) -> str:
        rng = np.random.default_rng((self.seed << 20) + step)
        return self.tasks[int(rng.choice(len(self.tasks), p=self.p))]


@dataclasses.dataclass
class PretrainState:
    params: Any
    opt_state: Any
    step: int = 0


class PretrainTrainer:
    def __init__(
        self,
        cfg: ModelConfig,
        batcher: PretrainBatcher,
        tasks: Sequence[str] = TASK_NAMES,
        mix_ratio: Sequence[float] = (5, 1, 1, 1, 2, 2),  # pretrain_r2r.json
        batch_size: int = 16,
        lr: float = 5e-5,
        warmup_steps: int = 10_000,
        total_steps: int = 200_000,
        grad_accum: int = 1,
        grad_norm: float = 5.0,  # pretrain default grad_norm
        seed: int = 0,
        views: int = 36,
        mesh=None,  # jax.sharding.Mesh('data','model'): dp+tp pretraining
        optim: str = "adamw",  # pretrain_src/optim zoo name
        weight_decay: float = 0.01,
        model=None,  # inject HAMTImagePretrain for e2e image pretraining
        params=None,
        aug_batcher: Optional[PretrainBatcher] = None,
        aug_ratio: float = 0.5,  # P(draw from aug stream) when given
        feat_table=None,  # (N, 36, D+P) resident table: index-mode H2D
        host_sharded: bool = False,  # per-process example assembly
    ):
        self.cfg = cfg
        self.batcher = batcher
        self.aug_batcher = aug_batcher
        self.aug_ratio = aug_ratio
        self.batch_size = batch_size
        # host-sharded feeding (the reference's per-rank DDP loaders,
        # main_r2r.py:40-92 + DistributedSampler): each process's
        # batcher draws only batch/n_proc examples and
        # make_array_from_process_local_data stitches the global batch.
        # ITM in-batch negatives stay within the process's shard (the
        # per-GPU semantics); give each process a differently-seeded
        # batcher for sample diversity.
        self.host_sharded = host_sharded and jax.process_count() > 1
        if self.host_sharded:
            assert mesh is not None, "host_sharded needs a mesh"
            nproc = jax.process_count()
            assert batch_size % nproc == 0, (batch_size, nproc)
            from ..parallel.mesh import process_feed_rows

            self._local_bs = batch_size // nproc
            self._row0, row1 = process_feed_rows(mesh, batch_size)
            assert row1 - self._row0 == self._local_bs
        else:
            self._local_bs = batch_size
            self._row0 = 0
        self.scheduler = TaskScheduler(tasks, mix_ratio, seed)
        self.mesh = mesh
        # index-mode feature transport (model.py:expand_index_batch):
        # batches carry int32 table rows; the table lives in HBM
        self._feat_table = (None if feat_table is None
                            else jax.device_put(jnp.asarray(feat_table)))
        if mesh is not None and self._feat_table is not None:
            from ..parallel.mesh import replicate

            self._feat_table = replicate(self._feat_table, mesh)

        if model is None:
            model, params = init_pretrain_params(
                cfg, jax.random.PRNGKey(seed), views=views,
                max_hist_len=batcher.ds.max_hist_len,
                instr_len=batcher.ds.max_txt_len,
            )
        assert params is not None, "model injection requires params"
        self.model = model
        if mesh is not None:
            # the reference scales pretraining with 4-GPU DDP
            # (README.md:53-60); here it's a mesh placement: params get
            # the TP rules, batches shard over 'data', and the SAME
            # jitted update below runs under GSPMD — the shardings ride
            # in on the inputs.
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)
        sched = warmup_linear_schedule(lr, warmup_steps, total_steps)
        # optimizer zoo routing (pretrain_src/optim; the e2e config uses
        # rangerlars, config/pretrain_r2r_e2e.json:14-24)
        self._lookahead = optim in ("lookahead", "rangerlars")
        tx = build_pretrain_optimizer(optim, sched,
                                      weight_decay=weight_decay,
                                      grad_norm=grad_norm,
                                      grad_accum=grad_accum)
        self.tx = tx
        if self._lookahead:
            params = self._wrap_lookahead(params)
        self.state = PretrainState(params=params, opt_state=tx.init(params))
        self._rng = jax.random.PRNGKey(seed + 99)

        lookahead = self._lookahead

        @partial(jax.jit, static_argnames=("task",),
                 donate_argnames=("params", "opt_state"))
        def _update(params, opt_state, batch, rng, task, feat_table=None):
            fast = params.fast if lookahead else params

            def loss_fn(p):
                loss, aux = self.model.apply(
                    {"params": p}, batch, task, deterministic=False,
                    feat_table=feat_table, rngs={"dropout": rng},
                )
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(fast)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        @partial(jax.jit, static_argnames=("task",))
        def _eval(params, batch, task, feat_table=None):
            return self.model.apply({"params": params}, batch, task,
                                    deterministic=True,
                                    feat_table=feat_table)

        self._update = _update
        self._eval = _eval
        self.logs: Dict[str, List[float]] = defaultdict(list)
        # single-worker prefetch: batch k+1 is built on a host thread
        # while the device trains on batch k (the reference's
        # PrefetchLoader H2D overlap, pretrain_src/data/loader.py:90-124)
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=1)
        self._next_batch = None

    # ------------------------------------------------------------------
    @staticmethod
    def _wrap_lookahead(params):
        # slow weights must be distinct buffers: the jitted update
        # donates its params, and aliased fast/slow would donate the
        # same buffer twice
        return optax.LookaheadParams(fast=params,
                                     slow=jax.tree.map(jnp.copy, params))

    @property
    def params(self):
        """The evaluation/checkpoint params (fast weights on lookahead)."""
        p = self.state.params
        return p.fast if self._lookahead else p

    def set_params(self, params) -> None:
        """Install externally built params (BERT/checkpoint init,
        ``main_r2r.py:131-148``) BEFORE training; optimizer state resets."""
        if self.mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, self.mesh)
        if self._lookahead:
            params = self._wrap_lookahead(params)
        self.state = PretrainState(params=params,
                                   opt_state=self.tx.init(params),
                                   step=self.state.step)

    def save(self, path: str) -> None:
        import pickle

        import flax.serialization as fser

        params = self.params
        if self.mesh is not None and jax.process_count() > 1:
            # TP-sharded leaves span non-addressable devices under a
            # multi-process mesh: all-gather to a replicated layout
            # (every process participates), then rank-0 writes
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            params = jax.tree.map(
                lambda x: (jax.jit(lambda a: a, out_shardings=repl)(x)
                           if isinstance(x, jax.Array)
                           and not x.is_fully_addressable else x),
                params)
        blob = {"step": self.state.step,
                "params": fser.to_state_dict(params)}
        if jax.process_index() == 0:
            with open(path, "wb") as f:
                pickle.dump(blob, f)

    def resume(self, path: str) -> int:
        """Resume model weights from a trainer checkpoint (the
        reference's --checkpoint path, main_r2r.py:145-148)."""
        import pickle

        import flax.serialization as fser

        with open(path, "rb") as f:
            blob = pickle.load(f)
        params = fser.from_state_dict(self.params, blob["params"])
        self.set_params(params)
        self.state = dataclasses.replace(self.state, step=int(blob["step"]))
        return self.state.step

    # ------------------------------------------------------------------
    def _pick_batcher(self, step: int) -> PretrainBatcher:
        if self.aug_batcher is None:
            return self.batcher
        rng = np.random.default_rng((self.scheduler.seed << 21) + step)
        return self.aug_batcher if rng.random() < self.aug_ratio else self.batcher

    def _build_batch(self, step: int):
        task = self.scheduler.sample(step)
        if task == "itm" and self._local_bs < 2:
            # in-batch ITM negatives need >= 2 items; the reference skips
            # these batches (main_r2r_image.py:239-246) — we resample
            task = next(t for t in self.scheduler.tasks if t != "itm")
        return task, self._pick_batcher(step).batch(task, self._local_bs)

    def train_step(self, sync: bool = True) -> Tuple[str, Any, Dict[str, Any]]:
        if self._next_batch is None:
            self._next_batch = self._pool.submit(self._build_batch,
                                                 self.state.step)
        task, batch = self._next_batch.result()
        self._next_batch = self._pool.submit(self._build_batch,
                                             self.state.step + 1)
        if self.host_sharded:
            from ..parallel.mesh import shard_batch_from_local

            if "itm_neg_idxs" in batch:
                # local in-batch negative indices -> global batch rows
                # (the model gathers pos_hist[neg_idxs], model.py:287)
                batch["itm_neg_idxs"] = batch["itm_neg_idxs"] + self._row0
            batch = shard_batch_from_local(
                batch, self.mesh, self._local_bs, self.batch_size,
                axes={"itm_shuffled_pos": 1})
        elif self.mesh is not None:
            from ..parallel.mesh import shard_batch

            batch = shard_batch(batch, self.mesh,
                                batch_size=self.batch_size)
        else:
            batch = jax.tree.map(jnp.asarray, batch)
        self._rng, rng = jax.random.split(self._rng)
        params, opt_state, loss, aux = self._update(
            self.state.params, self.state.opt_state, batch, rng, task,
            self._feat_table
        )
        self.state = PretrainState(params, opt_state, self.state.step + 1)
        if not sync:
            return task, loss, aux
        loss = float(loss)
        self.logs[f"{task}_loss"].append(loss)
        return task, loss, {k: float(np.asarray(v)) for k, v in aux.items()}

    def validate(self, val_batcher: PretrainBatcher,
                 tasks: Optional[Sequence[str]] = None,
                 n_batches: Optional[int] = None,
                 seed: int = 1234) -> Dict[str, Dict[str, float]]:
        """Per-task validation with cross-host reduction
        (main_r2r.py:319-511 validators + all_gather).

        Default (``n_batches=None``): iterate the ENTIRE val split per
        task in a fixed order (the reference walks the whole
        val dataloader per validator), wrap-padding the final partial
        batch so shapes stay static — padded duplicate rows are
        zero-weighted via ``ex_valid`` so each example counts exactly
        once; batch metrics accumulate weighted
        by their example counts; the masking/negative-sampling rng is
        re-seeded per (task, seed) so outputs are bit-stable across
        runs and across validation points. ``n_batches=N`` keeps the
        cheap sampled mode (random batches from the batcher stream).
        """
        from ..parallel.mesh import reduce_dict_mean

        out = {}
        for task in tasks or self.scheduler.tasks:
            if task == "itm" and self.batch_size < 2:
                continue
            full = n_batches is None
            saved_rng = val_batcher.rng
            if full:
                # deterministic augmentation stream, independent of how
                # many train/val draws came before (crc32, not hash():
                # str hashing is salted per process)
                import zlib

                val_batcher.rng = np.random.default_rng(
                    (seed << 8) + zlib.crc32(task.encode()) % 251)
            try:
                n_ex = val_batcher.n_examples(task) if full else 0
                nb = (max(1, -(-n_ex // self.batch_size)) if full
                      else n_batches)
                sums: Dict[str, float] = defaultdict(float)
                wsum = 0.0
                for bi in range(nb):
                    refs = (val_batcher.ordered_refs(
                        task, bi * self.batch_size, self.batch_size)
                        if full else None)
                    batch = val_batcher.batch(task, self.batch_size,
                                              refs=refs)
                    if full:
                        # the final partial batch is wrap-padded for
                        # static shapes; mask the duplicated rows so
                        # every example counts exactly once (model
                        # forwards honor ex_valid)
                        n_valid = min(self.batch_size,
                                      n_ex - bi * self.batch_size)
                        batch["ex_valid"] = (
                            np.arange(self.batch_size) < n_valid)
                    if self.mesh is not None:
                        # validation is identical-replica on every host
                        # (full split, deterministic refs/rng) — global
                        # P('data') arrays are coherent, and a mesh-less
                        # placement would feed host-local arrays to the
                        # mesh-sharded params under jax.process_count()>1
                        from ..parallel.mesh import shard_batch

                        batch = shard_batch(batch, self.mesh,
                                            batch_size=self.batch_size)
                    else:
                        batch = jax.tree.map(jnp.asarray, batch)
                    loss, aux = self._eval(self.params, batch, task,
                                           self._feat_table)
                    aux = {k: float(np.asarray(v)) for k, v in aux.items()}
                    w = aux.get("n", float(self.batch_size)) or 1.0
                    sums["loss"] += float(loss) * w
                    for k, v in aux.items():
                        sums[k] += v * w
                    wsum += w
                vals = {k: v / wsum for k, v in sums.items()}
                if "n" in vals:
                    vals["n"] = wsum  # total examples, not a mean of n
                out[task] = reduce_dict_mean(vals)
            finally:
                val_batcher.rng = saved_rng
        return out
