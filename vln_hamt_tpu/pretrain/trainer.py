"""Multi-task pretraining loop.

Parity target: ``pretrain_src/main_r2r.py:231-316`` (MetaLoader-driven
training with mix-ratio task sampling, gradient accumulation,
warmup-linear LR, periodic per-task validation) and
``pretrain_src/data/loader.py`` (MetaLoader).

TPU restructurings:
- the reference broadcasts the sampled task id from rank 0 over NCCL
  every step (loader.py:54-59); here the schedule is a pure function of
  (seed, step), identical on every host with zero communication.
- per-task jitted train steps (task string static) — six compiled
  programs total, each with one fixed batch shape.
- gradient accumulation via optax.MultiSteps instead of manual
  loss-division bookkeeping (main_r2r.py:243-251).
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import ModelConfig
from .model import init_pretrain_params
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


def warmup_linear_schedule(lr: float, warmup_steps: int, total_steps: int):
    """Linear warmup then linear decay to 0 (pretrain optim/sched.py:
    warmup_linear)."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )


@dataclasses.dataclass
class PretrainState:
    params: any
    opt_state: any
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
    ):
        self.cfg = cfg
        self.batcher = batcher
        self.batch_size = batch_size
        self.scheduler = TaskScheduler(tasks, mix_ratio, seed)
        self.mesh = mesh

        self.model, params = init_pretrain_params(
            cfg, jax.random.PRNGKey(seed), views=views,
            max_hist_len=batcher.ds.max_hist_len,
            instr_len=batcher.ds.max_txt_len,
        )
        if mesh is not None:
            # the reference scales pretraining with 4-GPU DDP
            # (README.md:53-60); here it's a mesh placement: params get
            # the TP rules, batches shard over 'data', and the SAME
            # jitted update below runs under GSPMD — the shardings ride
            # in on the inputs.
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)
        sched = warmup_linear_schedule(lr, warmup_steps, total_steps)
        tx = optax.chain(
            optax.clip_by_global_norm(grad_norm),
            optax.adamw(sched, weight_decay=0.01),
        )
        if grad_accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
        self.tx = tx
        self.state = PretrainState(params=params, opt_state=tx.init(params))
        self._rng = jax.random.PRNGKey(seed + 99)

        @partial(jax.jit, static_argnames=("task",), donate_argnames=("params", "opt_state"))
        def _update(params, opt_state, batch, rng, task):
            def loss_fn(p):
                loss, aux = self.model.apply(
                    {"params": p}, batch, task, deterministic=False,
                    rngs={"dropout": rng},
                )
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        @partial(jax.jit, static_argnames=("task",))
        def _eval(params, batch, task):
            return self.model.apply({"params": params}, batch, task,
                                    deterministic=True)

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
    def _build_batch(self, step: int):
        task = self.scheduler.sample(step)
        return task, self.batcher.batch(task, self.batch_size)

    def train_step(self, sync: bool = True) -> Tuple[str, Any, Dict[str, Any]]:
        if self._next_batch is None:
            self._next_batch = self._pool.submit(self._build_batch,
                                                 self.state.step)
        task, batch = self._next_batch.result()
        self._next_batch = self._pool.submit(self._build_batch,
                                             self.state.step + 1)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            batch = shard_batch(batch, self.mesh,
                                batch_size=self.batch_size)
        else:
            batch = jax.tree.map(jnp.asarray, batch)
        self._rng, rng = jax.random.split(self._rng)
        params, opt_state, loss, aux = self._update(
            self.state.params, self.state.opt_state, batch, rng, task
        )
        self.state = PretrainState(params, opt_state, self.state.step + 1)
        if not sync:
            return task, loss, aux
        loss = float(loss)
        self.logs[f"{task}_loss"].append(loss)
        return task, loss, {k: float(np.asarray(v)) for k, v in aux.items()}

    def validate(self, val_batcher: PretrainBatcher,
                 tasks: Optional[Sequence[str]] = None,
                 n_batches: int = 4) -> Dict[str, Dict[str, float]]:
        """Per-task validation (main_r2r.py:319-511 validators)."""
        out = {}
        for task in tasks or self.scheduler.tasks:
            losses, accs = [], []
            for _ in range(n_batches):
                batch = val_batcher.batch(task, self.batch_size)
                batch = jax.tree.map(jnp.asarray, batch)
                loss, aux = self._eval(self.state.params, batch, task)
                losses.append(float(loss))
                if "acc" in aux:
                    accs.append(float(np.asarray(aux["acc"])))
            out[task] = {"loss": float(np.mean(losses))}
            if accs:
                out[task]["acc"] = float(np.mean(accs))
        return out
