"""HAMTAgent: host-side orchestration of rollouts and training.

Parity target: ``Seq2SeqCMTAgent`` (``finetune_src/r2r/agent_cmt.py``),
restructured for TPU:

- IL (teacher forcing): the env rolls the whole ground-truth episode on
  the host, then ONE jitted differentiable scan computes all logits and
  the summed CE loss (vs the reference's per-step GPU forwards).
- RL (A2C): interactive rollout with a jitted per-step policy (sampling
  on device, one action download per step), host reward shaping with
  incremental nDTW, then a jitted REPLAY of the recorded episode that
  recomputes logits/values with the same dropout keys — gradients flow
  through one scan, and replayed logits match rollout logits exactly.
- 'sample' feedback = IL pass + RL pass per iteration with summed
  gradients in one update (agent_cmt.py:584-602).
- grad-clip 40 on the navigator only, critic unclipped
  (agent_cmt.py:597-601).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from collections import defaultdict
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import HAMTConfig
from ..env.observation import IGNORE_ID, ObsBatch
from ..env.r2r_env import R2RNavEnv
from ..eval.metrics import IncrementalNDTW
from ..models.hamt import init_hamt_params
from .losses import a2c_loss, il_loss
from .rollout import (
    HIST0_KEY_SALT,
    TXT_KEY_SALT,
    build_episode_forward,
    build_init_history,
    build_policy_step,
    build_text_encoder,
    step_key,
)


def make_optimizer(name: str, lr: float, weight_decay: float = 0.0,
                   grad_clip: Optional[float] = None) -> optax.GradientTransformation:
    """Optimizer zoo parity (agent_cmt.py:62-77)."""
    if name in ("adamw", "adamW"):
        opt = optax.adamw(lr, weight_decay=weight_decay)
    elif name == "adam":
        opt = optax.adam(lr)
    elif name == "rms":
        opt = optax.rmsprop(lr)
    elif name == "sgd":
        opt = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if grad_clip is not None:
        return optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


def episode_to_device(ep, feat_dtype=jnp.float32,
                      final_obs: Optional[ObsBatch] = None) -> Dict[str, jnp.ndarray]:
    """Compact EpisodeBatch -> device arrays (features cast to the
    compute dtype at the H2D boundary — half the transfer in bf16)."""
    d = {
        "txt_ids": ep.txt_ids,
        "txt_mask": ep.txt_mask,
        "view_index": ep.view_index,
        "cand_point": ep.cand_point,
        "cand_ang": ep.cand_ang,
        "actions": ep.actions,
        "step_mask": ep.step_mask,
        "teacher": ep.teacher,
    }
    if ep.pano_feat is None:
        # feature-table mode: ship (B, T) ints; the device gathers
        # features from the resident table inside the episode forward
        d["node_idx"] = ep.node_idx
    else:
        d["pano_feat"] = jnp.asarray(ep.pano_feat, feat_dtype)
    if final_obs is not None:
        d.update(
            final_pano_feat=jnp.asarray(final_obs.pano_feat, feat_dtype),
            final_view_index=final_obs.view_index,
            final_cand_point=final_obs.cand_point,
            final_cand_ang=final_obs.cand_ang,
        )
    return jax.tree.map(jnp.asarray, d)


@dataclasses.dataclass
class TrainState:
    params: Any
    cparams: Any
    opt_state: Any
    copt_state: Any
    step: int = 0


class HAMTAgent:
    #: packed eval assumes single-phase episodes ending at the first
    #: STOP with no extra per-episode outputs; variant agents with
    #: richer episode semantics opt out
    supports_packed_eval = True

    def __init__(self, cfg: HAMTConfig, env: Optional[R2RNavEnv] = None,
                 seed: int = 0):
        self.cfg = cfg
        self.env = env
        ecfg, mcfg, tcfg = cfg.env, cfg.model, cfg.train
        self.num_ob_tokens = ecfg.max_candidates + 1 + ecfg.views
        self.stop_slot = ecfg.max_candidates
        self.num_actions = self.num_ob_tokens  # REVERIE appends a slot

        rng = jax.random.PRNGKey(seed)
        self.model, self.critic, params, cparams = init_hamt_params(
            mcfg, rng, views=ecfg.views, num_ob_tokens=self.num_ob_tokens,
            instr_len=min(8, ecfg.max_instr_len),
            hist_len=ecfg.max_action_len + 1,
        )
        self.tx = make_optimizer(tcfg.optim, tcfg.lr, tcfg.weight_decay,
                                 grad_clip=tcfg.grad_clip)
        self.ctx = make_optimizer(tcfg.optim, tcfg.lr, tcfg.weight_decay)
        self.state = TrainState(
            params=params,
            cparams=cparams,
            opt_state=self.tx.init(params),
            copt_state=self.ctx.init(cparams),
        )

        self.episode_forward = build_episode_forward(
            self.model, self.critic, mcfg, ob_type=ecfg.ob_type)
        self.policy_step = build_policy_step(
            self.model, self.critic, mcfg, ob_type=ecfg.ob_type)
        self.encode_text = build_text_encoder(self.model)
        self.init_history = build_init_history(self.model)

        self._il_update = jax.jit(self._il_update_fn)
        self._il_rl_update = jax.jit(self._il_rl_update_fn)
        self._fused_sample_update = jax.jit(self._fused_sample_update_fn)
        self._merged_sample_update = jax.jit(self._merged_sample_update_fn)
        self.logs: Dict[str, List[float]] = defaultdict(list)
        self._iter_rng = jax.random.PRNGKey(seed + 17)
        self._feat_table = None  # device (N, V, D); enable_feature_table
        self._nav_tables = None  # device nav tables (device rollout)
        self._device_rollout_fn = None
        self._device_rollout_cache: Dict[tuple, Any] = {}
        self._text_row_update = None
        self._replicate_fn = None  # multi-process output gather (_fetch)
        self.mesh = None  # jax.sharding.Mesh; enable_mesh
        #: per-host sharded feeding (enable_host_sharded_feed): this
        #: process assembles only its own global-batch rows
        self.host_sharded_feed = False
        self._feed_rows: Optional[Tuple[int, int]] = None

    # R2R reward shaping is baked into the device rollout scan; task
    # variants with different rewards keep the host rollout
    device_rollout_rewards = True
    #: 'sample' feedback as ONE jitted program (IL + rollout-with-grad +
    #: A2C + optimizer) instead of rollout-then-replay; losses are
    #: equal by the replay-parity invariant (tested), one transformer
    #: sweep cheaper per iteration
    fused_sample_update = True
    #: go further: run the IL replay as extra teacher-forced LANES of
    #: the rollout scan itself (one T-step scan at batch 2B instead of
    #: two at B). Different RNG draws than the two-scan paths (joint
    #: dropout/sampling over the lanes — PARITY.md), so OFF by default
    #: paths that need bit-parity; see _merged_sample_update_fn
    merged_sample_update = False
    #: pack several teacher episodes per IL scan slot (enable_packed_il)
    packed_il = False

    def enable_feature_table(self, env: Optional[R2RNavEnv] = None) -> None:
        """Switch IL episode transport to device-resident features.

        Builds one (N, V, D) table over the env's graphs, device_puts it
        in the compute dtype, and flips the env into node-index episode
        mode: teacher episodes then ship (B, T) ints and the features
        are gathered on device inside the jitted forward. Also builds
        the nav tables that let the RL sampling rollout run as one
        device scan (build_device_rollout).
        """
        from ..data.feature_db import build_feature_table
        from ..data.nav_graph import build_nav_tables

        env = env or self.env
        table, offsets = build_feature_table(env.graphs, env.feat_db)
        self._feat_table = jax.device_put(
            jnp.asarray(table, self._feat_dtype()))
        env.feat_offsets = offsets
        nav, nav_offs = build_nav_tables(env.graphs,
                                         self.cfg.env.max_candidates)
        assert nav_offs == offsets  # same sorted-scan layout
        self._nav_tables = {k: jax.device_put(jnp.asarray(v))
                            for k, v in nav.items()}
        if self.mesh is not None:  # tables replicate across the mesh
            from ..parallel.mesh import replicate

            self._feat_table = replicate(self._feat_table, self.mesh)
            self._nav_tables = replicate(self._nav_tables, self.mesh)
        self._n_scan_max = max(g.num_nodes for g in env.graphs.values())
        self._ref_max = max((len(it["path"]) for it in env.data
                             if "path" in it), default=2)

    def enable_packed_il(self, text_cap: Optional[int] = None) -> None:
        """Pack teacher episodes densely into the IL scan (agents/
        packing.py): several episodes ride each scan slot back to back,
        so the static-T program stops paying for episode padding
        (~T/mean_len more episodes per update at R2R lengths; the
        reference's host loop gets the same effect by breaking early,
        ``agent_cmt.py`` all-ended break). The per-episode estimator is
        unchanged — packed updates are gradient-equivalent to unpacked
        updates over the same episodes (tests/test_packed_il.py).

        Requires feature-table transport (call enable_feature_table
        first). Affects ``train_iteration('teacher')`` only; 'sample'
        feedback keeps its merged rollout scan (an interactive rollout
        cannot be packed ahead of time — episode lengths are policy-
        dependent).

        Packers are per-env (keyed by the live env object), created
        lazily when ``self.env`` changes — GT/aug alternation (the
        reference's ``main.py`` interval loop swaps ``listner.env``
        every iteration) keeps each env's episode queue separate, and
        same-shaped envs share the one compiled program.
        """
        from .rollout import build_packed_il_forward

        assert self._feat_table is not None and \
            self.env.feat_offsets is not None, (
                "packed IL needs feature-table transport "
                "(enable_feature_table)")
        self._packed_text_cap = text_cap
        self._packers: Dict[int, Any] = {}
        self._packed_il_forward = build_packed_il_forward(
            self.model, self.cfg.model, ob_type=self.cfg.env.ob_type)
        self._packed_il_update = jax.jit(self._packed_il_update_fn)
        self.packed_il = True

    def _make_packer(self, env):
        """Packed-IL stream factory (variant hook: REVERIE substitutes
        its dual-target stream)."""
        from .packing import PackedILStream

        return PackedILStream(env, text_cap=self._packed_text_cap)

    @property
    def _packer(self):
        """The current env's packed-IL stream (lazily created)."""
        key = id(self.env)
        packer = self._packers.get(key)
        if packer is None:
            packer = self._make_packer(self.env)
            self._packers[key] = packer
        return packer

    def enable_mesh(self, mesh) -> None:
        """Shard the agent over a ('data', 'model') device mesh.

        TPU-native replacement for the reference's DDP wrap of the
        fine-tune agent (``agent_cmt.py:54-56`` via
        ``utils/distributed.py:57-71``): params follow the TP rules over
        'model' (replicated when mesh.model == 1), episode batches /
        rollout inputs are sharded over 'data', and GSPMD compiles the
        gradient all-reduce over ICI into the jitted updates. The
        device rollout and policy steps run under the same mesh.

        Call BEFORE training (like the DDP wrap): optimizer state is
        re-initialized from the sharded params. Checkpoint loads after
        this re-place restored values on the mesh.
        """
        from ..parallel.mesh import replicate, shard_params

        assert self.cfg.train.batch_size % mesh.shape["data"] == 0, (
            f"batch {self.cfg.train.batch_size} not divisible by "
            f"data={mesh.shape['data']}"
        )
        self.mesh = mesh
        st = self.state
        params = shard_params(st.params, mesh)
        cparams = replicate(st.cparams, mesh)
        self.state = TrainState(
            params=params,
            cparams=cparams,
            opt_state=self.tx.init(params),
            copt_state=self.ctx.init(cparams),
            step=st.step,
        )
        if self._feat_table is not None:
            self._feat_table = replicate(self._feat_table, mesh)
        if self._nav_tables is not None:
            self._nav_tables = replicate(self._nav_tables, mesh)
        if getattr(self, "_obj_tables", None) is not None:
            self._obj_tables = replicate(self._obj_tables, mesh)

    def enable_host_sharded_feed(self) -> None:
        """Per-host sharded batch feeding over a multi-process mesh.

        The identical-replica default (tests/mp_worker.py) has every
        process assemble the full global batch from a same-seeded env
        replica — correct, but host env work doesn't scale with
        processes. In sharded-feed mode each process's env holds only
        its own shard of the data and assembles only its own
        ``process_feed_rows`` rows of the global batch;
        ``jax.make_array_from_process_local_data`` stitches the global
        ``P('data')`` arrays with zero host-side replication (the
        reference's per-rank DDP feeding, ``cvdn/main.py:42-49`` +
        ``utils/distributed.py:57-71``, without the gradient bucketing).

        Supported paths: teacher IL, the fused/merged/device-rollout
        'sample' updates, and :meth:`eval_split_device` — everything
        that runs episodes as device scans. The host-LOOP paths
        (lock-step rollout/eval, packed eval) interleave data-dependent
        host control flow per process and stay on identical replicas.

        Call AFTER ``enable_mesh`` (and ``enable_feature_table``), with
        ``self.env`` already pointing at this process's shard: the env
        batch must equal this process's row count.
        """
        from ..parallel.mesh import host_allgather, process_feed_rows

        assert self.mesh is not None, "enable_mesh first"
        start, stop = process_feed_rows(self.mesh,
                                        self.cfg.train.batch_size)
        if self.env is not None:
            assert self.env.batch_size == stop - start, (
                f"env batch {self.env.batch_size} != this process's "
                f"global-batch rows [{start}, {stop})")
        self._feed_rows = (start, stop)
        self.host_sharded_feed = True
        # episode-shape constants must be GLOBAL: a per-shard max would
        # compile different programs on different processes (deadlock)
        if hasattr(self, "_ref_max"):
            self._ref_max = max(g["r"] for g in host_allgather(
                {"r": self._ref_max}))
        if hasattr(self, "_n_scan_max"):
            self._n_scan_max = max(g["n"] for g in host_allgather(
                {"n": self._n_scan_max}))

    def _feed_local(self, x: np.ndarray) -> np.ndarray:
        """Slice a fetched GLOBAL batch array down to this process's
        own rows (identity without sharded feeding)."""
        if not self.host_sharded_feed:
            return x
        start, stop = self._feed_rows
        return x[start:stop]

    def _shard_data(self, tree, batch_size: Optional[int] = None):
        """Shard batch-leading leaves over the mesh 'data' axis (no-op
        without a mesh). Leaves whose leading dim != batch_size (when
        given) are replicated instead. In sharded-feed mode the tree
        holds only this process's rows and is stitched into the global
        batch instead."""
        if self.mesh is None:
            return tree
        if self.host_sharded_feed:
            from ..parallel.mesh import shard_batch_from_local

            assert batch_size is not None, (
                "sharded feeding needs the local batch size")
            return shard_batch_from_local(
                tree, self.mesh, batch_size, self.cfg.train.batch_size)
        from ..parallel.mesh import shard_batch

        return shard_batch(tree, self.mesh, batch_size)

    def _place_like(self, template, tree):
        """Restore checkpointed values onto the template's shardings."""
        if self.mesh is None:
            return tree
        return jax.tree.map(
            lambda a, b: jax.device_put(jnp.asarray(b, a.dtype), a.sharding),
            template, tree,
        )

    def _fetch(self, x) -> np.ndarray:
        """Device -> host value of a possibly data-sharded output.

        Multi-PROCESS meshes (jax.distributed): a 'data'-sharded output
        spans non-addressable devices, so np.asarray would raise; an
        all-gather to a replicated layout (compiled, rides the
        interconnect) makes every process hold the full value — each
        host steps its full env replica with the global action vector
        (the reference equivalent: DDP ranks step only their shard and
        merge results, distributed.py:90-130; here env replicas stay in
        lock-step instead)."""
        if self.mesh is not None and jax.process_count() > 1:
            if self._replicate_fn is None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._replicate_fn = jax.jit(
                    lambda t: t,
                    out_shardings=NamedSharding(self.mesh, P()))
            x = self._replicate_fn(x)
        return np.asarray(x)

    # ------------------------------------------------------------------
    def _next_rng(self) -> jax.Array:
        self._iter_rng, out = jax.random.split(self._iter_rng)
        return out

    def _feat_dtype(self):
        return jnp.bfloat16 if self.cfg.model.dtype == "bfloat16" else jnp.float32

    def _ep_to_device(self, ep, final_obs: Optional[ObsBatch] = None):
        d = episode_to_device(ep, self._feat_dtype(), final_obs)
        return self._shard_data(d, batch_size=d["actions"].shape[0])

    # ---------------------------------------------------------- losses
    def _il_loss(self, params, cparams, ep, rng, weight, feat_table=None):
        out = self.episode_forward(params, cparams, ep, rng,
                                   deterministic=False,
                                   feat_table=feat_table)
        teacher = jnp.moveaxis(ep["teacher"], 0, 1)  # (T, B)
        b = ep["actions"].shape[0]
        loss = il_loss(out.logits, teacher, IGNORE_ID) * weight / b
        return loss, {"IL_loss": loss}

    def _rl_loss(self, params, cparams, ep, rewards, masks, bootstrap_mask,
                 rng, feat_table=None):
        out = self.episode_forward(params, cparams, ep, rng,
                                   deterministic=False,
                                   feat_table=feat_table)
        actions = jnp.moveaxis(ep["actions"], 0, 1)  # (T, B)
        tcfg = self.cfg.train
        # bootstrap only for episodes still alive after the horizon
        # (agent_cmt.py:481-484)
        last_value = jnp.where(bootstrap_mask, out.last_value, 0.0)
        loss, aux = a2c_loss(
            out.logits, actions, out.values, rewards, masks, last_value,
            gamma=tcfg.gamma, entropy_weight=tcfg.entropy_loss_weight,
            normalize=tcfg.normalize_loss,
        )
        aux["RL_loss"] = loss
        return loss, aux

    def _il_update_fn(self, state_params, state_cparams, opt_state, copt_state,
                      ep, rng, il_weight, feat_table=None):
        def loss_fn(params, cparams):
            return self._il_loss(params, cparams, ep, rng, il_weight,
                                 feat_table)

        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                has_aux=True)(
            state_params, state_cparams
        )
        gp, gc = grads
        updates, opt_state = self.tx.update(gp, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        cupdates, copt_state = self.ctx.update(gc, copt_state, state_cparams)
        cparams = optax.apply_updates(state_cparams, cupdates)
        return params, cparams, opt_state, copt_state, loss, aux

    def _packed_il_loss(self, params, pack, rng, weight, feat_table):
        logits = self._packed_il_forward(params, pack, rng,
                                         deterministic=False,
                                         feat_table=feat_table)
        teacher = jnp.moveaxis(pack["teacher"], 0, 1)  # (T, S)
        # same summed-CE estimator as _il_loss, normalized by the number
        # of packed EPISODES (the unpacked path divides by its batch
        # size = its episode count)
        loss = il_loss(logits, teacher, IGNORE_ID) * weight \
            / pack["n_episodes"]
        return loss, {"IL_loss": loss}

    def _packed_il_update_fn(self, state_params, state_cparams, opt_state,
                             copt_state, pack, rng, il_weight,
                             feat_table=None):
        def loss_fn(params, cparams):
            del cparams  # critic unused by IL; decay-only update below
            return self._packed_il_loss(params, pack, rng, il_weight,
                                        feat_table)

        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                has_aux=True)(
            state_params, state_cparams
        )
        gp, gc = grads
        updates, opt_state = self.tx.update(gp, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        # zero critic grads, like the unpacked teacher update (the
        # optimizer still applies weight decay — identical semantics)
        cupdates, copt_state = self.ctx.update(gc, copt_state,
                                               state_cparams)
        cparams = optax.apply_updates(state_cparams, cupdates)
        return params, cparams, opt_state, copt_state, loss, aux

    def _il_rl_update_fn(self, state_params, state_cparams, opt_state,
                         copt_state, il_ep, il_rng, il_weight, rl_ep, rewards,
                         masks, bootstrap_mask, rl_rng, feat_table=None):
        def loss_fn(params, cparams):
            l1, a1 = self._il_loss(params, cparams, il_ep, il_rng, il_weight,
                                   feat_table)
            l2, a2 = self._rl_loss(params, cparams, rl_ep, rewards, masks,
                                   bootstrap_mask, rl_rng, feat_table)
            return l1 + l2, {**a1, **a2}

        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                has_aux=True)(
            state_params, state_cparams
        )
        gp, gc = grads
        updates, opt_state = self.tx.update(gp, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        cupdates, copt_state = self.ctx.update(gc, copt_state, state_cparams)
        cparams = optax.apply_updates(state_cparams, cupdates)
        return params, cparams, opt_state, copt_state, loss, aux

    def _fused_il_loss(self, params, cparams, il_ep, il_rng, weight,
                       feat_table, obj_tables):
        """IL half of the fused sample update (REVERIE overrides with
        its dual-CE loss + object tables)."""
        return self._il_loss(params, cparams, il_ep, il_rng, weight,
                             feat_table)

    def _fused_sample_update_fn(self, state_params, state_cparams, opt_state,
                                copt_state, il_ep, il_rng, il_weight, rins,
                                rl_rng, feat_table, nav, obj_tables=None):
        """ONE program for the whole 'sample' iteration: IL episode loss
        + the sampling rollout WITH gradients + the A2C loss on the
        rollout's own logits/values + both optimizer steps.

        The two-step path (device rollout, then `_il_rl_update` replay)
        re-runs the rollout's forward under grad; because the replay is
        bit-identical to the rollout (same fold_in keys — the replay-
        parity invariant), differentiating THROUGH the rollout scan
        computes the same losses/gradients while skipping that second
        forward: 4 transformer sweeps per iteration instead of 5.
        Sampling is integer-valued (no gradient path through actions or
        rewards), so this is exactly the REINFORCE/A2C estimator of the
        replay formulation.
        """
        rollout_raw = self._device_rollout_fn.raw

        def loss_fn(params, cparams):
            l1, a1 = self._fused_il_loss(params, cparams, il_ep, il_rng,
                                         il_weight, feat_table, obj_tables)
            ep, extras = rollout_raw(
                params, cparams, rins["txt_ids"], rins["txt_mask"], rl_rng,
                feat_table, nav, rins["start_node"], rins["start_view"],
                rins["offs"], rins["task_inputs"], obj_tables=obj_tables,
                deterministic=False, compute_bootstrap=True)
            actions = jnp.moveaxis(ep["actions"], 0, 1)  # (T, B)
            tcfg = self.cfg.train
            last_value = jnp.where(extras["bootstrap_mask"],
                                   extras["last_value"], 0.0)
            l2, a2 = a2c_loss(
                extras["rollout_logits"], actions, extras["values"],
                extras["rewards"], extras["masks"], last_value,
                gamma=tcfg.gamma, entropy_weight=tcfg.entropy_loss_weight,
                normalize=tcfg.normalize_loss)
            a2["RL_loss"] = l2
            return l1 + l2, {**a1, **a2}

        (loss, aux), (gp, gc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state_params, state_cparams)
        updates, opt_state = self.tx.update(gp, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        cupdates, copt_state = self.ctx.update(gc, copt_state, state_cparams)
        cparams = optax.apply_updates(state_cparams, cupdates)
        return params, cparams, opt_state, copt_state, loss, aux

    def _merged_il_loss(self, extras, il_ep, weight):
        """CE on the merged scan's IL-lane logits (≡ `_il_loss` on a
        replay; REVERIE overrides with its dual act+object CE)."""
        teacher = jnp.moveaxis(il_ep["teacher"], 0, 1)  # (T, B_il)
        b_il = il_ep["actions"].shape[0]
        return il_loss(extras["il_logits"], teacher, IGNORE_ID) * weight / b_il

    def _merged_sample_update_fn(self, state_params, state_cparams, opt_state,
                                 copt_state, il_ep, il_weight, rins, rng,
                                 feat_table, nav, obj_tables=None):
        """The merged 'sample' iteration: ONE T-step scan over
        B_rl + B_il lanes (``build_device_rollout`` with ``il=`` lanes)
        computes the sampling rollout AND the teacher-forced IL replay
        together, then IL-CE + A2C + both optimizer steps — half the
        sequential transformer evaluations of the fused two-scan path.
        Per-step kernels at HAMT shapes are bandwidth-bound, so the
        2x-wide batch is nearly free.

        NOT bit-identical to the two-scan paths: dropout masks and
        sampling gumbels are drawn jointly over the concatenated lanes
        (PARITY.md) — an equally valid draw of the same estimator.
        """
        rollout_raw = self._device_rollout_fn.raw
        tcfg = self.cfg.train

        def loss_fn(params, cparams):
            il = {k: il_ep[k] for k in
                  ("node_idx", "view_index", "actions", "step_mask")}
            txt_ids = jnp.concatenate(
                [rins["txt_ids"], il_ep["txt_ids"]], axis=0)
            txt_mask = jnp.concatenate(
                [rins["txt_mask"], il_ep["txt_mask"]], axis=0)
            ep, extras = rollout_raw(
                params, cparams, txt_ids, txt_mask, rng,
                feat_table, nav, rins["start_node"], rins["start_view"],
                rins["offs"], rins["task_inputs"], obj_tables=obj_tables,
                deterministic=False, compute_bootstrap=True, il=il)
            l1 = self._merged_il_loss(extras, il_ep, il_weight)
            actions = jnp.moveaxis(ep["actions"], 0, 1)  # (T, B)
            last_value = jnp.where(extras["bootstrap_mask"],
                                   extras["last_value"], 0.0)
            l2, a2 = a2c_loss(
                extras["rollout_logits"], actions, extras["values"],
                extras["rewards"], extras["masks"], last_value,
                gamma=tcfg.gamma, entropy_weight=tcfg.entropy_loss_weight,
                normalize=tcfg.normalize_loss)
            a2["RL_loss"] = l2
            a2["IL_loss"] = l1
            return l1 + l2, a2

        (loss, aux), (gp, gc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state_params, state_cparams)
        updates, opt_state = self.tx.update(gp, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        cupdates, copt_state = self.ctx.update(gc, copt_state, state_cparams)
        cparams = optax.apply_updates(state_cparams, cupdates)
        return params, cparams, opt_state, copt_state, loss, aux

    # ----------------------------------------------------- interactive
    def interactive_rollout(
        self,
        mode: str,
        base_rng: jax.Array,
        deterministic: bool,
        record_for_replay: bool = False,
        no_cand_backtrack: bool = False,
    ):
        """Run one interactive episode batch against self.env.

        Returns (trajectories, extras). ``trajectories`` follows the
        reference result schema: [{instr_id, path: [(vp, h, e), ...]}].
        With ``record_for_replay``, extras carries everything the RL
        replay needs (episode arrays, rewards, masks).
        """
        # per-process data-dependent control flow (the ended.all() early
        # break, per-step action fetches indexed by env rows) requires
        # identical env replicas on every process
        assert not self.host_sharded_feed, (
            "host-loop rollout needs identical-replica envs; sharded "
            "feeding supports the device-scan paths only")
        env = self.env
        spec = env.spec
        stop = self.stop_slot
        # feature-table mode: no host feature work anywhere in the
        # rollout — policy steps ship (B,) node rows, the replay episode
        # ships (B, T) rows, and the device gathers from the table
        use_table = getattr(env, "feat_offsets", None) is not None
        if use_table:
            assert self._feat_table is not None, \
                "env is in feature-table mode but the agent has no table"
        obs = env.reset()
        feat_offs = (np.array([env.feat_offsets[it["scan"]]
                               for it in env.batch], np.int64)
                     if use_table else None)
        b = obs.batch_size
        t_max = env.max_action_len

        txt_ids, txt_mask = env.txt_batch()
        txt_ids = jnp.asarray(txt_ids)
        txt_mask = jnp.asarray(txt_mask)
        txt_embeds = self.encode_text(
            self.state.params, txt_ids, txt_mask,
            jax.random.fold_in(base_rng, TXT_KEY_SALT), deterministic
        )
        hist0 = self.init_history(
            self.state.params, jax.random.fold_in(base_rng, HIST0_KEY_SALT),
            batch_size=b, deterministic=deterministic,
        )
        hist_cache = jnp.zeros(
            (b, t_max + 1, self.cfg.model.hidden_size), hist0.dtype
        ).at[:, 0].set(hist0)
        hist_len = jnp.ones((b,), jnp.int32)

        graphs = [env.sim.graph(i) for i in range(b)]
        traj = [
            {
                "instr_id": env.batch[i]["instr_id"],
                "path": [self._pose_tuple(env, i)],
            }
            for i in range(b)
        ]
        # reward bookkeeping (agent_cmt.py:283-289); ep_state is the
        # task-specific mutable episode state consumed by the reward /
        # transition hooks (variant agents extend it)
        ep_state = self._episode_state_init(obs, graphs, traj)

        ended = np.zeros((b,), bool)
        visited = [set([int(obs.node[i])]) for i in range(b)]

        obs_list: List[ObsBatch] = []
        actions_rec = np.full((b, t_max), stop, np.int32)
        step_mask = np.zeros((b, t_max), bool)
        rewards = np.zeros((t_max, b), np.float32)
        logits_rec: List[np.ndarray] = []

        fd = self._feat_dtype()
        for t in range(t_max):
            obs_list.append(obs)
            forbid = np.zeros((b, self.num_ob_tokens), bool)
            if no_cand_backtrack:
                for i in range(b):
                    for c in range(stop):
                        cn = int(obs.cand_node[i, c])
                        if cn >= 0 and cn in visited[i]:
                            forbid[i, c] = True
            live = ~ended
            if use_table:
                feat_args = dict(
                    pano_feat=None,
                    node_idx=jnp.asarray((feat_offs + obs.node).astype(np.int32)),
                )
            else:
                feat_args = dict(pano_feat=jnp.asarray(obs.pano_feat, fd))
            step_ins = self._shard_data(dict(
                view_index=jnp.asarray(obs.view_index),
                cand_point=jnp.asarray(obs.cand_point),
                cand_ang=jnp.asarray(obs.cand_ang),
                live=jnp.asarray(live), forbid=jnp.asarray(forbid),
                given_action=jnp.asarray(
                    obs.teacher if mode == "teacher"
                    else np.zeros(b, np.int32)),
                **feat_args,
            ), batch_size=b)
            a_dev, logits, value, hist_cache, hist_len = self.policy_step(
                self.state.params, self.state.cparams, txt_embeds, txt_mask,
                hist_cache, hist_len, t,
                rng=step_key(base_rng, t),
                mode=mode, deterministic=deterministic,
                feat_table=self._feat_table if use_table else None,
                **step_ins,
            )
            a_t = self._fetch(a_dev)
            step_mask[:, t] = live
            actions_rec[:, t] = np.where(live, a_t, stop)
            if record_for_replay:
                logits_rec.append(self._fetch(logits))

            self._pre_env_step(t, a_t, live, ended, obs, ep_state, traj)
            env_actions = np.where(live & (a_t != stop), a_t, -1)
            obs = env.step(env_actions, obs)
            for i in range(b):
                if env_actions[i] >= 0:
                    traj[i]["path"].append(self._pose_tuple(env, i))
                    visited[i].add(int(obs.node[i]))
                    if "ndtw" in ep_state:
                        ep_state["ndtw"].update(i, int(obs.node[i]))

            if record_for_replay:
                rewards[t] = self._step_rewards(t, a_t, live, ended, obs,
                                                ep_state)

            ended = self._update_ended(ended, a_t, ep_state,
                                       train_rl=record_for_replay)
            if ended.all():
                break

        extras: Dict[str, Any] = {}
        if record_for_replay:
            # pad to t_max so the replay scan has ONE compiled shape
            # (the reference breaks early per batch, agent_cmt.py:450-451;
            # masked dead steps are cheaper than XLA recompiles)
            while len(obs_list) < t_max:
                obs_list.append(obs_list[-1])
            ep = self._stack_obs_episode(
                obs_list, txt_ids, txt_mask, actions_rec, step_mask,
                final_obs=obs, feat_offs=feat_offs,
            )
            extras = {
                "ep": ep,
                "rewards": jnp.asarray(rewards),
                "masks": jnp.asarray(step_mask.T.astype(np.float32)),
                "bootstrap_mask": jnp.asarray(~ended),
                "rollout_logits": np.stack(logits_rec, axis=0),  # (T_used, B, N)
            }
        return traj, extras

    # ------------------------------------------ device-resident rollout
    #: reward/termination shaping compiled into the rollout scan
    #: (rollout.py:build_device_rollout); variant agents override
    device_rollout_task = "r2r"

    def _ensure_device_rollout_fn(self):
        # keyed on the env's episode shape so an eval env with a
        # different horizon/margin gets its own compiled scan instead of
        # silently reusing the first env's t_max
        env = self.env
        key = (self.device_rollout_task, env.max_action_len,
               float(env.error_margin))
        fn = self._device_rollout_cache.get(key)
        if fn is None:
            from .rollout import build_device_rollout

            fn = build_device_rollout(
                self.model, self.critic, self.cfg.model, env.max_action_len,
                ob_type=self.cfg.env.ob_type, error_margin=env.error_margin,
                task=self.device_rollout_task)
            self._device_rollout_cache[key] = fn
        self._device_rollout_fn = fn
        return fn

    def _device_rollout_args(self, include_rewards: bool = True):
        """Host prep for a device rollout: reset the env, ship start
        poses + the task's cost slabs, shard over 'data'.

        ``include_rewards=False`` skips the cost slabs (greedy device
        eval: no reward shaping, works on GT-less test splits)."""
        env = self.env
        obs = env.reset()
        b = obs.batch_size
        offs = np.array([env.feat_offsets[it["scan"]] for it in env.batch],
                        np.int32)
        task_inputs = (self._device_rollout_inputs(env, obs)
                       if include_rewards else {})
        txt_ids, txt_mask = env.txt_batch()
        # batch-leading inputs shard over 'data'; tables are replicated
        ins = self._shard_data(
            dict(txt_ids=jnp.asarray(txt_ids), txt_mask=jnp.asarray(txt_mask),
                 start_node=jnp.asarray((offs + obs.node).astype(np.int32)),
                 start_view=jnp.asarray(obs.view_index),
                 offs=jnp.asarray(offs),
                 **{k: jnp.asarray(v) for k, v in task_inputs.items()}),
            batch_size=b)
        return ins, list(task_inputs)

    def device_rollout_iteration(self, rng: jax.Array):
        """One RL sampling rollout entirely on device.

        The host only resets the env (table mode: no feature work) and
        ships start poses + the task's per-item cost slabs
        (:meth:`_device_rollout_inputs`); the graph walk, sampling,
        history, reward shaping, and episode recording all run inside
        one jitted ``lax.scan`` (rollout.py:build_device_rollout).
        """
        fn = self._ensure_device_rollout_fn()
        ins, tkeys = self._device_rollout_args()
        return fn(
            self.state.params, self.state.cparams,
            ins["txt_ids"], ins["txt_mask"], rng,
            self._feat_table, self._nav_tables,
            ins["start_node"], ins["start_view"], ins["offs"],
            {k: ins[k] for k in tkeys},
            obj_tables=getattr(self, "_obj_tables", None),
            deterministic=False)

    def _goal_cost_slab(self, env, goal_nodes_fn) -> np.ndarray:
        """(B, N_scan_max) per-node distance to the item's goal set."""
        b = len(env.batch)
        slab = np.full((b, self._n_scan_max), np.inf, np.float32)
        for i, item in enumerate(env.batch):
            g = env.graphs[item["scan"]]
            goals = goal_nodes_fn(g, item)
            slab[i, : g.num_nodes] = (
                g.dist[:, goals].min(axis=1) if len(goals) > 1
                else g.dist[:, goals[0]])
        return slab

    def _device_rollout_inputs(self, env, obs) -> Dict[str, np.ndarray]:
        """Per-item cost slabs for the in-scan reward (R2R: nDTW
        reference costs; variants override, matching their host
        ``_step_rewards``)."""
        b = obs.batch_size
        n_max, r_max = self._n_scan_max, self._ref_max
        ref_cost = np.full((b, n_max, r_max), np.inf, np.float32)
        ref_len = np.zeros((b,), np.int32)
        for i, item in enumerate(env.batch):
            g = env.graphs[item["scan"]]
            ref = g.indices(item["path"])
            ref_len[i] = len(ref)
            ref_cost[i, : g.num_nodes, : len(ref)] = g.dist[:, ref]
        return {"ref_cost": ref_cost, "ref_len": ref_len}

    # ------------------------------------------------- rollout hooks
    # Task-variant agents override these; defaults implement the R2R
    # reward shaping and episode-termination semantics
    # (agent_cmt.py:407-447).

    def _episode_state_init(self, obs, graphs, traj) -> Dict[str, Any]:
        b = obs.batch_size
        gt_idx = [graphs[i].indices(self.env.batch[i]["path"]) for i in range(b)]
        ndtw = IncrementalNDTW([g.dist for g in graphs], gt_idx,
                               obs.node.tolist())
        return {
            "ndtw": ndtw,
            "last_dist": obs.dist_to_goal.copy(),
            "last_ndtw": np.array([ndtw.value(i) for i in range(b)], np.float32),
        }

    def _pre_env_step(self, t, a_t, live, ended, obs, ep_state, traj) -> None:
        """Called after action selection, before the env transition."""

    def _step_rewards(self, t, a_t, live, ended, obs, ep_state) -> np.ndarray:
        b = len(a_t)
        stop = self.stop_slot
        rewards = np.zeros((b,), np.float32)
        ndtw = ep_state["ndtw"]
        dist = obs.dist_to_goal
        cur_ndtw = np.array([ndtw.value(i) for i in range(b)], np.float32)
        last_dist, last_ndtw = ep_state["last_dist"], ep_state["last_ndtw"]
        for i in range(b):
            if not live[i]:
                continue
            if a_t[i] == stop:  # stop action (agent_cmt.py:424-428)
                rewards[i] = 2.0 + cur_ndtw[i] * 2.0 if dist[i] < 3.0 else -2.0
            else:
                delta = -(dist[i] - last_dist[i])
                nr = cur_ndtw[i] - last_ndtw[i]
                # sign-quantified fidelity reward (agent_cmt.py:430-438;
                # the reference raises on delta == 0, which CAN legally
                # occur with equidistant nodes — we treat it as regress)
                rewards[i] = (1.0 + nr) if delta > 0.0 else (-1.0 + nr)
                # miss-the-target penalty (agent_cmt.py:439-441)
                if last_dist[i] <= 1.0 and dist[i] - last_dist[i] > 0.0:
                    rewards[i] -= (1.0 - last_dist[i]) * 2.0
        ep_state["last_dist"] = dist.copy()
        ep_state["last_ndtw"] = cur_ndtw
        return rewards

    def _update_ended(self, ended, a_t, ep_state, train_rl: bool) -> np.ndarray:
        return ended | (a_t == self.stop_slot)

    # ------------------------------------ packed-eval per-slot hooks
    # (continuation-packed eval keeps per-slot episode state here so
    # variants with richer episode semantics — R2R-Back's two phases,
    # REVERIE's object grounding — can ride the packed evaluator)
    def _packed_slot_init(self, env, i: int) -> Dict[str, Any]:
        """Fresh per-slot episode state when a slot (re)loads an item."""
        return {}

    def _packed_slot_done(self, st: Dict[str, Any], g, i: int,
                          a_t_i: int, steps: int) -> bool:
        """Termination test after a policy step; ``steps`` counts policy
        steps taken this episode (the lock-step budget is policy
        iterations, agent_base.py:25-47 x max_action_len)."""
        return a_t_i == self.stop_slot or steps >= g.env.max_action_len

    def _packed_slot_result(self, st: Dict[str, Any], pred: dict) -> None:
        """Attach per-slot extras (e.g. midstop, predObjId)."""

    def _packed_env_actions(self, a_t: np.ndarray,
                            active: np.ndarray) -> np.ndarray:
        """Env transition vector for a packed step (-1 = no move)."""
        return np.where(active & (a_t != self.stop_slot), a_t, -1)

    def _packed_policy_step(self, g, step_ins: Dict[str, Any],
                            use_table: bool):
        """Dispatch one packed-eval policy step (non-blocking); updates
        the group's history state and returns (action_dev, aux_dev)."""
        a_dev, _, _, g.hist_cache, g.hist_len = self.policy_step(
            self.state.params, self.state.cparams, g.txt_embeds,
            jnp.asarray(g.txt_mask), g.hist_cache, g.hist_len,
            jnp.asarray(np.minimum(g.t_vec, g.t_max - 1)),
            rng=self._next_rng(), mode="argmax", deterministic=True,
            feat_table=self._feat_table if use_table else None,
            **step_ins,
        )
        return a_dev, None

    @staticmethod
    def _pose_tuple(env: R2RNavEnv, i: int) -> Tuple[str, float, float]:
        st = env.sim.get_state(i)
        g = env.sim.graph(i)
        return (g.node_ids[st.node], st.heading, st.elevation)

    def _stack_obs_episode(self, obs_list, txt_ids, txt_mask, actions,
                           step_mask, final_obs=None,
                           feat_offs=None) -> Dict[str, jnp.ndarray]:
        fd = self._feat_dtype()
        stack = lambda attr: np.stack([getattr(o, attr) for o in obs_list], axis=1)
        d = {
            "txt_ids": txt_ids,
            "txt_mask": txt_mask,
            "view_index": stack("view_index"),
            "cand_point": stack("cand_point"),
            "cand_ang": stack("cand_ang"),
            "actions": actions,
            "step_mask": step_mask,
            "teacher": np.stack([o.teacher for o in obs_list], axis=1),
        }
        if feat_offs is not None:
            # feature-table mode: (B, T) global rows, gathered on device
            d["node_idx"] = np.stack(
                [feat_offs + o.node for o in obs_list], axis=1
            ).astype(np.int32)
        else:
            d["pano_feat"] = jnp.asarray(stack("pano_feat"), fd)
        if final_obs is not None:
            d.update(
                final_view_index=final_obs.view_index,
                final_cand_point=final_obs.cand_point,
                final_cand_ang=final_obs.cand_ang,
            )
            if feat_offs is not None:
                d["final_node_idx"] = (feat_offs
                                       + final_obs.node).astype(np.int32)
            else:
                d["final_pano_feat"] = jnp.asarray(final_obs.pano_feat, fd)
        return jax.tree.map(jnp.asarray, d)

    # ------------------------------------------------------------ train
    def train_iteration(self, feedback: Optional[str] = None,
                        sync: bool = True) -> Dict[str, Any]:
        """One optimizer step (agent_cmt.py:569-602).

        With ``sync=False`` the returned scalars are device arrays and
        the host does NOT block on the step — jax's async dispatch then
        overlaps the next episode's host assembly with device compute.
        Convert (float()) only at logging boundaries.
        """
        feedback = feedback or self.cfg.train.feedback
        st = self.state
        tcfg = self.cfg.train
        if feedback == "teacher":
            if self.packed_il:
                pack = self._packer.next_pack()
                n_eps = int(pack["n_episodes"])
                pack = self._shard_data(
                    jax.tree.map(jnp.asarray, pack),
                    batch_size=self._packer.slots)
                rng = self._next_rng()
                (params, cparams, opt_state, copt_state, loss,
                 aux) = self._packed_il_update(
                    st.params, st.cparams, st.opt_state, st.copt_state,
                    pack, rng, tcfg.teacher_weight, self._feat_table,
                )
                aux = {**aux, "episodes": n_eps}
            else:
                ep = self._ep_to_device(self.env.teacher_episode())
                rng = self._next_rng()
                (params, cparams, opt_state, copt_state, loss,
                 aux) = self._il_update(
                    st.params, st.cparams, st.opt_state, st.copt_state,
                    ep, rng, tcfg.teacher_weight, self._feat_table,
                )
        elif feedback == "sample":
            il_ep = self._ep_to_device(self.env.teacher_episode())
            use_device = (self.device_rollout_rewards
                          and self._nav_tables is not None
                          and self.env.feat_offsets is not None)
            if use_device and self.merged_sample_update:
                # one scan: IL lanes ride INSIDE the rollout scan.
                # RNG accounting (PARITY.md #18): the merged program
                # draws IL and RL dropout keys JOINTLY from one rl_rng
                # (2B lanes, fold_in(base, t) per step) — there is no
                # separate host-side il_rng, which is exactly why this
                # path is a different (equally valid) estimator from
                # the fused two-scan update below.
                rl_rng = self._next_rng()
                self._ensure_device_rollout_fn()
                ins, tkeys = self._device_rollout_args()
                rins = {k: ins[k] for k in ("txt_ids", "txt_mask",
                                            "start_node", "start_view",
                                            "offs")}
                rins["task_inputs"] = {k: ins[k] for k in tkeys}
                (params, cparams, opt_state, copt_state, loss,
                 aux) = self._merged_sample_update(
                    st.params, st.cparams, st.opt_state, st.copt_state,
                    il_ep, tcfg.ml_weight, rins, rl_rng,
                    self._feat_table, self._nav_tables)
            elif use_device and self.fused_sample_update:
                # one program: IL + sampling rollout WITH grads + A2C +
                # optimizer step (no separate replay forward). Two host
                # draws, matching the rollout-then-replay path below
                # bit-for-bit (the fold_in(base, t) invariant).
                il_rng = self._next_rng()
                rl_rng = self._next_rng()
                self._ensure_device_rollout_fn()
                ins, tkeys = self._device_rollout_args()
                rins = {k: ins[k] for k in ("txt_ids", "txt_mask",
                                            "start_node", "start_view",
                                            "offs")}
                rins["task_inputs"] = {k: ins[k] for k in tkeys}
                (params, cparams, opt_state, copt_state, loss,
                 aux) = self._fused_sample_update(
                    st.params, st.cparams, st.opt_state, st.copt_state,
                    il_ep, il_rng, tcfg.ml_weight, rins, rl_rng,
                    self._feat_table, self._nav_tables,
                    getattr(self, "_obj_tables", None))
            else:
                # rollout-then-replay: the replay program regenerates
                # the rollout's dropout masks from the same fold_in
                # keys in a DIFFERENT compiled program — only threefry
                # guarantees identical bits across programs. rbg would
                # silently corrupt the RL gradient here; the fused/
                # merged single-program updates (above) are rng_impl-
                # agnostic.
                if jax.config.jax_default_prng_impl != "threefry2x32":
                    raise ValueError(
                        "the rollout-then-replay 'sample' path requires "
                        "the threefry PRNG (replay-parity invariant); "
                        "use fused/merged_sample_update with rng_impl="
                        f"{jax.config.jax_default_prng_impl!r}")
                il_rng = self._next_rng()
                rl_rng = self._next_rng()
                if use_device:
                    # fully device-resident sampling rollout: one scan,
                    # no per-step host round trips
                    rl_ep, extras = self.device_rollout_iteration(rl_rng)
                    extras = {"ep": rl_ep, **extras}
                else:
                    _, extras = self.interactive_rollout(
                        "sample", rl_rng, deterministic=False,
                        record_for_replay=True
                    )
                params, cparams, opt_state, copt_state, loss, aux = self._il_rl_update(
                    st.params, st.cparams, st.opt_state, st.copt_state,
                    il_ep, il_rng, tcfg.ml_weight, extras["ep"], extras["rewards"],
                    extras["masks"], extras["bootstrap_mask"], rl_rng,
                    self._feat_table,
                )
        else:
            raise ValueError(f"bad feedback {feedback!r}")

        self.state = TrainState(params, cparams, opt_state, copt_state,
                                st.step + 1)
        if not sync:
            return {"loss": loss, **aux}
        out = {"loss": float(loss)}
        for k, v in aux.items():
            val = float(jnp.asarray(v)) if jnp.ndim(v) == 0 else float(np.mean(v))
            out[k] = val
            self.logs[k].append(val)
        return out

    # ------------------------------------------------------------- eval
    def eval_split(self, env: Optional[R2RNavEnv] = None,
                   no_cand_backtrack: bool = False) -> List[dict]:
        """Greedy full-split evaluation (agent_base.py:25-47): iterate
        until an instr_id repeats, keeping the FIRST prediction."""
        env = env or self.env
        old_env, self.env = self.env, env
        env.reset_epoch(shuffle=False)
        results: Dict[str, dict] = {}
        looped = False
        while not looped:
            trajs, _ = self.interactive_rollout(
                "argmax", self._next_rng(), deterministic=True,
                no_cand_backtrack=no_cand_backtrack,
            )
            for tr in trajs:
                if tr["instr_id"] in results:
                    looped = True
                else:
                    results[tr["instr_id"]] = tr
        self.env = old_env
        out = []
        for k, v in results.items():
            pred = {"instr_id": k, "trajectory": v["path"]}
            for extra in ("midstop", "predObjId"):
                if extra in v:
                    pred[extra] = v[extra]
            out.append(pred)
        return out

    def eval_split_fast(self, env: Optional[R2RNavEnv] = None,
                        no_cand_backtrack: bool = False) -> List[dict]:
        """The fastest applicable greedy evaluator: the device-scan
        eval when the feature/nav tables are resident (and
        no_cand_backtrack is off — it needs host visited-set masking),
        else the continuation-packed evaluator, else lock-step. All
        three produce identical predictions (tested)."""
        env = env or self.env
        if (not no_cand_backtrack and self._nav_tables is not None
                and getattr(env, "feat_offsets", None) is not None):
            return self.eval_split_device(env)
        if self.supports_packed_eval:
            return self.eval_split_packed(env, no_cand_backtrack)
        return self.eval_split(env, no_cand_backtrack)

    def eval_split_device(self, env: Optional[R2RNavEnv] = None) -> List[dict]:
        """Greedy full-split evaluation as fully DEVICE-RESIDENT scans.

        Where :meth:`eval_split` / :meth:`eval_split_packed` make one
        host↔device round trip per policy step, this runs each batch's
        whole greedy episode as the same one-program ``lax.scan`` used
        by the RL rollout (``build_device_rollout`` with
        ``policy='argmax'``, ``compute_rewards=False``): transitions are
        nav-table gathers, and the host only decodes the recorded
        node/view sequences into trajectories (poses are pure functions
        of the discretized view index, env/sim.py:view_heading).
        Requires the feature/nav tables; ``no_cand_backtrack`` is not
        supported (use the packed evaluator). Batch iteration and
        keep-first-prediction semantics match :meth:`eval_split`
        (loop until an instr_id repeats, agent_base.py:25-47).
        """
        env = env or self.env
        assert (self._nav_tables is not None
                and env.feat_offsets is not None), (
            "device eval needs enable_feature_table()")
        old_env, self.env = self.env, env
        try:
            fn = self._ensure_device_rollout_fn()
            env.reset_epoch(shuffle=False)
            st = self.state
            results: Dict[str, dict] = {}
            # Under sharded feeding, each iteration runs GLOBAL SPMD
            # collectives (the rollout program + the _fetch all-gather),
            # but shard sizes differ (the last rank absorbs the
            # len%n_proc remainder, env/r2r_env.py:75-80) so processes
            # wrap after different batch counts. Every process must
            # therefore keep issuing the collectives until ALL shards
            # have wrapped — a process that stopped at its LOCAL wrap
            # would deadlock the rest. Extra post-wrap batches only
            # produce duplicate instr_ids, which are discarded.
            sharded = self.host_sharded_feed and jax.process_count() > 1
            if sharded:
                from ..parallel.mesh import host_allgather
            looped = False
            while True:
                ins, _ = self._device_rollout_args(include_rewards=False)
                ep, extras = fn(
                    st.params, st.cparams, ins["txt_ids"], ins["txt_mask"],
                    jax.random.PRNGKey(0), self._feat_table, self._nav_tables,
                    ins["start_node"], ins["start_view"], ins["offs"], {},
                    obj_tables=getattr(self, "_obj_tables", None),
                    deterministic=True, policy="argmax", compute_rewards=False)
                for tr in self._decode_device_trajectories(env, ep, extras):
                    if tr["instr_id"] in results:
                        looped = True
                    else:
                        results[tr["instr_id"]] = tr
                if sharded:
                    if all(g["l"] for g in host_allgather({"l": looped})):
                        break
                elif looped:
                    break
        finally:
            self.env = old_env
        return list(results.values())

    def _decode_device_trajectories(self, env, ep, extras) -> List[dict]:
        """Recorded scan episode -> eval predictions (host-side)."""
        from ..data.angle import view_elevation, view_heading

        # sharded feeding: the fetched arrays are GLOBAL; decode only
        # this process's rows (they map 1:1 onto env.batch)
        node = self._feed_local(self._fetch(ep["node_idx"]))
        view = self._feed_local(self._fetch(ep["view_index"]))
        actions = self._feed_local(self._fetch(ep["actions"]))
        mask = self._feed_local(self._fetch(ep["step_mask"]))
        fnode = self._feed_local(self._fetch(ep["final_node_idx"]))
        fview = self._feed_local(self._fetch(ep["final_view_index"]))
        extras_np = {k: self._feed_local(v)
                     for k, v in self._fetch_decode_extras(extras).items()}
        b, t_max = node.shape
        c = env.spec.max_candidates  # action < c is a nav move
        out = []
        for i in range(b):
            item = env.batch[i]
            off = env.feat_offsets[item["scan"]]
            g = env.graphs[item["scan"]]

            def pose(n_, v_):
                return (g.node_ids[int(n_) - off],
                        float(view_heading(int(v_))),
                        float(view_elevation(int(v_))))

            path = [pose(node[i, 0], view[i, 0])]
            for t in range(t_max):
                if not mask[i, t]:
                    break
                if actions[i, t] < c:  # nav move: pose after the step
                    nn = node[i, t + 1] if t + 1 < t_max else fnode[i]
                    nv = view[i, t + 1] if t + 1 < t_max else fview[i]
                    path.append(pose(nn, nv))
            pred = {"instr_id": item["instr_id"], "trajectory": path}
            self._decode_device_extras(pred, env, i, node, view, actions,
                                       mask, extras_np)
            out.append(pred)
        return out

    def _ensure_text_row_update(self):
        """Jitted scatter-update: re-encode only K text rows and write
        them into the cached (B, ...) text embeddings — the packed
        evaluator's slot reset touches a few rows per consume, so
        re-encoding the whole batch (round-1 verdict #7) wasted
        (B-K)/B of the text-encoder work."""
        if self._text_row_update is None:
            no_lang_ca = self.cfg.model.no_lang_ca

            @jax.jit
            def upd(params, txt_embeds, ids_k, mask_k, rows, rng):
                emb = self.encode_text(params, ids_k, mask_k, rng, True)
                emb = emb.astype(txt_embeds.dtype)
                if no_lang_ca:  # (X+1, B, L, D): batch is axis 1
                    return txt_embeds.at[:, rows].set(emb)
                return txt_embeds.at[rows].set(emb)

            self._text_row_update = upd
        return self._text_row_update

    def _fetch_decode_extras(self, extras) -> dict:
        """Device extras -> the host arrays the per-item decode needs.

        CONTRACT: every returned array must be BATCH-leading — the
        sharded-feed path slices axis 0 down to this process's rows
        (transpose (T, B) scan records here, like ReverieAgent does) —
        fetched ONCE per batch (variant agents override)."""
        return {}

    def _decode_device_extras(self, pred, env, i, node, view, actions,
                              mask, extras_np) -> None:
        """Per-task prediction extras (midstop, predObjId) — variant
        agents override. ``extras_np`` is :meth:`_fetch_decode_extras`'s
        host-side batch fetch."""
        return None

    def eval_split_packed(self, env: Optional[R2RNavEnv] = None,
                          no_cand_backtrack: bool = False,
                          pipeline: int = 4) -> List[dict]:
        """Continuation-packed greedy evaluation, software-pipelined.

        Packing: the lock-step evaluator idles a batch slot once its
        episode stops and only retires a batch when ALL episodes stop.
        Here a finished slot immediately loads the next pending item:
        its history-cache row is reset on device, its text row
        re-encoded, and its per-slot step counter restarts — so the
        device stays at full batch occupancy for the whole split.

        Pipelining: with ``pipeline`` > 1 the split is partitioned into
        that many independent groups, each with its own env/history
        state. Dispatching every group's policy step before blocking on
        any group's action overlaps one group's host env step (and the
        action download latency) with another group's device compute.
        Per-slot transformer rows are batch-independent, so results are
        identical to ``pipeline=1``. Semantics match :meth:`eval_split`
        (each item predicted exactly once).
        """
        from .rollout import build_slot_reset

        assert not self.host_sharded_feed, (
            "packed eval is a host-loop path; sharded feeding supports "
            "eval_split_device")
        env = env or self.env
        old_env, self.env = self.env, env
        if not hasattr(self, "_slot_reset"):
            self._slot_reset = build_slot_reset(self.model)

        items = list(env.data)
        b = env.batch_size
        # each group needs at least a full batch of items to be useful;
        # measured sweet spot on v5e-over-tunnel is 4 groups (BASELINE.md)
        n_groups = max(1, min(int(pipeline), len(items) // b))
        groups = []
        for k in range(n_groups):
            part = items[k::n_groups]
            genv = env if k == 0 else env.clone_shell(part)
            groups.append(_PackedEvalGroup(self, genv, part,
                                           no_cand_backtrack))

        while any(g.active.any() for g in groups):
            for g in groups:  # enqueue device work for every group...
                if g.active.any():
                    g.dispatch()
            for g in groups:  # ...then block + host-step one at a time
                if g.active.any():
                    g.consume()

        self.env = old_env
        results: Dict[str, dict] = {}
        for g in groups:
            results.update(g.results)
        return list(results.values())

    # ------------------------------------------------------ checkpoints
    def save_orbax(self, path: str, async_: bool = False) -> None:
        """Orbax checkpoint (durable, partially-restorable, the
        production path; the pickle format below mirrors the
        reference's single-file torch checkpoints).

        ``async_=True`` commits the save on a background thread (orbax
        AsyncCheckpointer): the device arrays are snapshotted
        synchronously, then serialization/IO overlap training — the
        standard multi-host TPU pattern. The previous async save is
        awaited first (orbax requirement); call
        :meth:`wait_for_checkpoints` before reading the files.

        Optimizer state is included (as a flax state dict, so the optax
        namedtuple structure round-trips) so ``--resume_optimizer``
        works for orbax checkpoints just like the pickle format
        (reference: agent_cmt.py:607-645)."""
        import flax.serialization as fser
        import orbax.checkpoint as ocp

        tree = {
            "params": self.state.params,
            "cparams": self.state.cparams,
            "step": self.state.step,
            "opt_state": fser.to_state_dict(self.state.opt_state),
            "copt_state": fser.to_state_dict(self.state.copt_state),
        }
        if async_:
            if getattr(self, "_async_ckptr", None) is None:
                self._async_ckptr = ocp.AsyncCheckpointer(
                    ocp.PyTreeCheckpointHandler())
            self._async_ckptr.save(os.path.abspath(path), tree, force=True)
            return
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)

    def wait_for_checkpoints(self) -> None:
        """Block until any in-flight async orbax save has committed."""
        if getattr(self, "_async_ckptr", None) is not None:
            self._async_ckptr.wait_until_finished()

    def load_orbax(self, path: str, resume_optimizer: bool = False) -> int:
        import flax.serialization as fser
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        blob = ckptr.restore(os.path.abspath(path))
        st = self.state

        def restore(template, tree):
            if self.mesh is not None:
                return self._place_like(template, tree)
            return jax.tree.map(lambda a, b: jnp.asarray(b, a.dtype),
                                template, tree)

        params = restore(st.params, blob["params"])
        cparams = restore(st.cparams, blob["cparams"])
        opt_state, copt_state = st.opt_state, st.copt_state
        if resume_optimizer:
            # older orbax saves (pre round-4) carried no optimizer state;
            # fail loudly rather than silently resetting the LR schedule
            if "opt_state" not in blob:
                raise ValueError(
                    f"resume_optimizer requested but {path} has no "
                    "opt_state (saved before optimizer state was added "
                    "to the orbax tree)")
            opt_state = restore(
                st.opt_state, fser.from_state_dict(st.opt_state,
                                                   blob["opt_state"]))
            copt_state = restore(
                st.copt_state, fser.from_state_dict(st.copt_state,
                                                    blob["copt_state"]))
        self.state = TrainState(params, cparams, opt_state, copt_state,
                                int(blob["step"]))
        return int(blob["step"])

    def _gather_for_save(self, tree):
        """Make every leaf host-materializable: under a multi-process
        mesh, TP-sharded leaves span non-addressable devices and
        np.asarray would raise — all-gather them to a replicated layout
        first (every process participates in the collective)."""
        if self.mesh is None or jax.process_count() == 1:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())

        def gather(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return jax.jit(lambda a: a, out_shardings=repl)(x)
            return x

        return jax.tree.map(gather, tree)

    def save(self, path: str) -> None:
        import flax.serialization as fser

        st = self.state
        blob = {
            "step": st.step,
            "params": fser.to_state_dict(self._gather_for_save(st.params)),
            "cparams": fser.to_state_dict(self._gather_for_save(st.cparams)),
            "opt_state": fser.to_state_dict(
                self._gather_for_save(st.opt_state)),
            "copt_state": fser.to_state_dict(
                self._gather_for_save(st.copt_state)),
        }
        # rank-0 write (every process participated in the gathers above;
        # on a shared filesystem concurrent writers would clobber)
        if jax.process_index() == 0:
            with open(path, "wb") as f:
                pickle.dump(blob, f)

    # --------------------------------------------- weight initialization
    def _install_params(self, partial, critic_partial=None) -> List[str]:
        """Merge converted (possibly partial) weight trees over the
        current params with name/shape matching (the reference's
        strict=False ``from_pretrained`` load, vlnbert_init.py:64-67),
        cast to the template dtypes, and re-place on the mesh if one is
        enabled. Optimizer state re-initializes (fresh fine-tuning run).
        Returns the skipped (missing/shape-mismatched) leaf paths."""
        import flax.serialization as fser

        from ..models.convert import merge_matching_params

        st = self.state
        merged, skipped = merge_matching_params(
            fser.to_state_dict(st.params), partial)
        params = fser.from_state_dict(st.params, merged)
        cparams = st.cparams
        if critic_partial is not None:
            cmerged, cskip = merge_matching_params(
                fser.to_state_dict(st.cparams), critic_partial)
            cparams = fser.from_state_dict(st.cparams, cmerged)
            skipped += [f"critic.{p}" for p in cskip]
        cast = lambda tpl, tree: jax.tree.map(
            lambda a, b: jnp.asarray(b, a.dtype), tpl, tree)
        params = self._place_like(st.params, cast(st.params, params))
        cparams = self._place_like(st.cparams, cast(st.cparams, cparams))
        self.state = TrainState(params, cparams, self.tx.init(params),
                                self.ctx.init(cparams), st.step)
        return skipped

    def init_from_pretrain(self, path: str) -> List[str]:
        """Initialize the trunk (and graft the SAP head onto the action
        head) from a ``run/pretrain.py`` checkpoint — the reference's
        core pretrain->fine-tune recipe (``--bert_ckpt_file``,
        vlnbert_init.py:20-31; flag at r2r/parser.py:44). Call BEFORE
        ``enable_mesh``/``load``. Returns skipped leaf paths."""
        import pickle

        from ..models.convert import pretrain_to_finetune_params

        with open(path, "rb") as f:
            blob = pickle.load(f)
        pp = blob.get("params", blob) if isinstance(blob, dict) else blob
        return self._install_params(pretrain_to_finetune_params(pp))

    def init_from_reference(self, path: str) -> List[str]:
        """Initialize from a released reference torch checkpoint —
        either an agent save (agent_cmt.py:607-622; critic included) or
        a pretrain ModelSaver state dict (the ``--bert_ckpt_file``
        files). Call BEFORE ``enable_mesh``/``load``."""
        from ..models.convert import load_reference_checkpoint

        params, critic = load_reference_checkpoint(path)
        return self._install_params(params, critic)

    def load(self, path: str, resume_optimizer: bool = False) -> int:
        import flax.serialization as fser

        if os.path.isdir(path):  # orbax checkpoints are directories
            return self.load_orbax(path, resume_optimizer=resume_optimizer)
        with open(path, "rb") as f:
            blob = pickle.load(f)
        st = self.state
        params = self._place_like(
            st.params, fser.from_state_dict(st.params, blob["params"]))
        cparams = self._place_like(
            st.cparams, fser.from_state_dict(st.cparams, blob["cparams"]))
        if resume_optimizer:
            opt_state = self._place_like(
                st.opt_state,
                fser.from_state_dict(st.opt_state, blob["opt_state"]))
            copt_state = self._place_like(
                st.copt_state,
                fser.from_state_dict(st.copt_state, blob["copt_state"]))
        else:
            opt_state, copt_state = st.opt_state, st.copt_state
        self.state = TrainState(params, cparams, opt_state, copt_state,
                                blob["step"])
        return blob["step"]


class _PackedEvalGroup:
    """One pipeline group of continuation-packed greedy evaluation.

    Owns an env (batch of slots), per-slot device history state and the
    host-side bookkeeping. ``dispatch`` enqueues one policy step on the
    device and returns without blocking (JAX dispatch is async);
    ``consume`` blocks on the action download and advances the env. The
    caller interleaves dispatch/consume across groups to hide the
    download latency and host env time behind device compute.
    """

    def __init__(self, agent: "HAMTAgent", env, items, no_cand_backtrack):
        self.a = agent
        self.env = env
        self.no_cand_backtrack = no_cand_backtrack
        self.b = b = env.batch_size
        self.t_max = env.max_action_len
        self.stop = agent.stop_slot
        self.fd = agent._feat_dtype()

        # initial fill through load_item (lets task envs derive the
        # supervision path for raw items, e.g. CVDN start/end panos);
        # pad by cycling when the split is tiny
        env.batch = [None] * b
        for i in range(b):
            env.load_item(i, items[i % len(items)])
        self.pending = list(items[b:])
        self.pending.reverse()  # pop() from the front of the split order

        self.rng = agent._next_rng()
        txt_ids, txt_mask = env.txt_batch()
        self.txt_mask = txt_mask
        self.txt_embeds = agent.encode_text(
            agent.state.params, jnp.asarray(txt_ids), jnp.asarray(txt_mask),
            self.rng, True)
        hist_cache = jnp.zeros(
            (b, self.t_max + 1, agent.cfg.model.hidden_size),
            jnp.bfloat16 if agent.cfg.model.dtype == "bfloat16"
            else jnp.float32)
        self.hist_cache, self.hist_len = agent._slot_reset(
            agent.state.params, hist_cache, jnp.ones((b,), jnp.int32),
            jnp.ones((b,), bool), self.rng)

        self.t_vec = np.zeros((b,), np.int32)  # policy steps this episode
        self.active = np.ones((b,), bool)
        self.traj = [[agent._pose_tuple(env, i)] for i in range(b)]
        self.visited = [set([int(env.sim.node[i])]) for i in range(b)]
        self.slot_state = [agent._packed_slot_init(env, i) for i in range(b)]
        self.results: Dict[str, dict] = {}
        self.obs = env._observe()
        self._a_dev = None
        self._aux_dev = None
        self._aux_np = None

    def dispatch(self) -> None:
        a, env, obs, b = self.a, self.env, self.obs, self.b
        forbid = np.zeros((b, a.num_actions), bool)
        if self.no_cand_backtrack:
            for i in range(b):
                for c in range(self.stop):
                    cn = int(obs.cand_node[i, c])
                    if cn >= 0 and cn in self.visited[i]:
                        forbid[i, c] = True
        use_table = env.feat_offsets is not None
        if use_table:
            assert a._feat_table is not None, \
                "env is in feature-table mode but the agent has no table"
            offs = np.array([env.feat_offsets[it["scan"]]
                             for it in env.batch], np.int64)
            feat_args = dict(
                pano_feat=None,
                node_idx=jnp.asarray((offs + obs.node).astype(np.int32)),
            )
        else:
            feat_args = dict(pano_feat=jnp.asarray(obs.pano_feat, self.fd))
        step_ins = a._shard_data(dict(
            view_index=jnp.asarray(obs.view_index),
            cand_point=jnp.asarray(obs.cand_point),
            cand_ang=jnp.asarray(obs.cand_ang),
            live=jnp.asarray(self.active), forbid=jnp.asarray(forbid),
            given_action=jnp.zeros((b,), jnp.int32),
            **feat_args,
        ), batch_size=b)
        self._a_dev, self._aux_dev = a._packed_policy_step(
            self, step_ins, use_table)
        self._aux_np = None

    def aux_np(self) -> np.ndarray:
        """Host copy of the step's auxiliary output (e.g. REVERIE
        object logits), cached per consume."""
        if self._aux_np is None:
            self._aux_np = self.a._fetch(self._aux_dev)
        return self._aux_np

    def consume(self) -> None:
        a, env, b, stop = self.a, self.env, self.b, self.stop
        a_t = a._fetch(self._a_dev)  # blocks: device step + download
        self._a_dev = None

        env_actions = a._packed_env_actions(a_t, self.active)
        obs_after = env.step(env_actions, self.obs)
        reset_mask = np.zeros((b,), bool)
        for i in range(b):
            if not self.active[i]:
                continue
            self.t_vec[i] += 1  # lock-step budget unit = policy steps
            if env_actions[i] >= 0:
                self.traj[i].append(a._pose_tuple(env, i))
                self.visited[i].add(int(env.sim.node[i]))
            done = a._packed_slot_done(self.slot_state[i], self, i,
                                       int(a_t[i]), int(self.t_vec[i]))
            if not done:
                continue
            instr_id = env.batch[i]["instr_id"]
            if instr_id not in self.results:
                # cycled-fill duplicates resolve to the first prediction
                pred = {"instr_id": instr_id, "trajectory": self.traj[i]}
                a._packed_slot_result(self.slot_state[i], pred)
                self.results[instr_id] = pred
            if self.pending:
                env.load_item(i, self.pending.pop())
                self.traj[i] = [a._pose_tuple(env, i)]
                self.visited[i] = set([int(env.sim.node[i])])
                self.slot_state[i] = a._packed_slot_init(env, i)
                self.t_vec[i] = 0
                reset_mask[i] = True
            else:
                self.active[i] = False
        if reset_mask.any():
            self.hist_cache, self.hist_len = a._slot_reset(
                a.state.params, self.hist_cache, self.hist_len,
                jnp.asarray(reset_mask), self.rng)
            txt_ids, txt_mask = env.txt_batch()
            self.txt_mask = txt_mask
            # slot-granular text re-encode: only the reset rows run the
            # text encoder (fixed-K chunks; pad by repeating the first
            # row — identical values, so the duplicate scatter is safe)
            rows = np.nonzero(reset_mask)[0]
            k = min(b, 8)
            upd = a._ensure_text_row_update()
            for s in range(0, len(rows), k):
                chunk = rows[s:s + k]
                pad = np.full((k,), chunk[0], np.int32)
                pad[: len(chunk)] = chunk
                self.txt_embeds = upd(
                    a.state.params, self.txt_embeds,
                    jnp.asarray(txt_ids[pad]), jnp.asarray(txt_mask[pad]),
                    jnp.asarray(pad), self.rng)
            self.obs = env._observe()
        else:
            self.obs = obs_after
