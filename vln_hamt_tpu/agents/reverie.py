"""REVERIE agent: joint navigation + object grounding.

Parity target: ``NavRefCMTAgent`` (finetune_src/reverie/agent.py) with
the NavRefCMT model (reverie/vlnbert_navref.py). Action semantics: the
action space is the obs layout PLUS one appended slot whose logit is the
MAX object logit — selecting it stops the episode and grounds the
predicted object (reverie/agent.py:251-254, 298-304). Supervision is a
dual CE: action slots (STOP = the appended slot) + the ground-truth
object among the final viewpoint's candidates (agent.py:271-275).

Deviation (documented): the reference leaves the layout's own STOP
token selectable, which would crash its candidate lookup if ever chosen
(agent.py:299-301 vs env candidate indexing); we mask it with -inf so
the appended object-stop slot is the only stop action.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import HAMTConfig
from ..env.observation import IGNORE_ID, ObsBatch
from ..models.hamt import HAMT
from .agent import HAMTAgent
from .losses import il_loss
from .rollout import (
    FINAL_KEY_SALT,
    HIST0_KEY_SALT,
    TXT_KEY_SALT,
    EpisodeOutputs,
    _full_logits,
    _hist_mask,
    _make_ref_policy_core,
    _obj_angle_table,
    remat_scan_body,
    step_key,
)


def build_ref_policy_step(model: HAMT, critic, cfg):
    """Jitted single interactive REVERIE step; the policy math lives in
    the shared ``rollout._make_ref_policy_core`` (same invariant as the
    base agent: host steps and the device rollout scan must be
    bit-identical)."""
    ang_tab = _obj_angle_table(cfg.angle_feat_size)  # (36, 36, A)
    core = _make_ref_policy_core(model, critic, cfg)

    @partial(jax.jit, static_argnames=("mode", "deterministic"),
             donate_argnames=("hist_cache",))
    def policy_step(params, cparams, txt_embeds, txt_mask, hist_cache,
                    hist_len, t, pano_feat, view_index, cand_point, cand_ang,
                    obj_fts, obj_angs, obj_pos, obj_mask,
                    live, forbid, given_action,
                    rng, mode="argmax", deterministic=True,
                    node_idx=None, feat_table=None, obj_tables=None):
        if node_idx is not None:
            # feature-table transport: pano row + object row gathered on
            # device; relative object angles from the (36,36,A) table
            pano_feat = feat_table[node_idx]
            obj_fts = obj_tables["fts"][node_idx]
            obj_pos = obj_tables["pos"][node_idx]
            obj_mask = obj_tables["mask"][node_idx]
            ov = obj_tables["view"][node_idx]
            obj_angs = jnp.where(obj_mask[..., None],
                                 ang_tab[view_index[:, None], ov], 0.0)
        return core(params, cparams, txt_embeds, txt_mask, hist_cache,
                    hist_len, t, pano_feat, view_index, cand_point, cand_ang,
                    obj_fts, obj_angs, obj_pos, obj_mask,
                    live, forbid, given_action, rng, mode, deterministic)

    return policy_step


def build_ref_episode_forward(model: HAMT, critic, cfg, stop_slot: int):
    from .rollout import make_expand_obs

    expand_obs = make_expand_obs(36, cfg.angle_feat_size)
    ang_tab = _obj_angle_table(cfg.angle_feat_size)

    def episode_forward(params, cparams, ep, rng, deterministic=False,
                        feat_table=None, obj_tables=None):
        if "node_idx" in ep:
            ep = dict(ep)
            ni = ep["node_idx"]
            ep["pano_feat"] = feat_table[ni]
            ep["obj_fts"] = obj_tables["fts"][ni]
            ep["obj_pos"] = obj_tables["pos"][ni]
            om = obj_tables["mask"][ni]
            ov = obj_tables["view"][ni]
            ep["obj_mask"] = om
            ep["obj_angs"] = jnp.where(
                om[..., None], ang_tab[ep["view_index"][..., None], ov], 0.0)
            if "final_node_idx" in ep:
                fi = ep["final_node_idx"]
                ep["final_pano_feat"] = feat_table[fi]
                ep["final_obj_fts"] = obj_tables["fts"][fi]
                ep["final_obj_pos"] = obj_tables["pos"][fi]
                fom = obj_tables["mask"][fi]
                fov = obj_tables["view"][fi]
                ep["final_obj_mask"] = fom
                ep["final_obj_angs"] = jnp.where(
                    fom[..., None],
                    ang_tab[ep["final_view_index"][..., None], fov], 0.0)
        txt_ids, txt_mask = ep["txt_ids"], ep["txt_mask"]
        b, t_steps = ep["actions"].shape
        h_max = t_steps + 1

        apply = partial(model.apply, {"params": params})
        txt_embeds = apply(txt_ids, txt_mask, deterministic,
                           method=HAMT.encode_text,
                           rngs={"dropout": jax.random.fold_in(rng, TXT_KEY_SALT)})
        hist0 = apply(b, deterministic, method=HAMT.init_history,
                      rngs={"dropout": jax.random.fold_in(rng, HIST0_KEY_SALT)})
        hist_cache = jnp.zeros((b, h_max, cfg.hidden_size), hist0.dtype)
        hist_cache = hist_cache.at[:, 0].set(hist0)
        hist_len = jnp.ones((b,), jnp.int32)

        tm = lambda name: jnp.moveaxis(ep[name], 0, 1)
        xs = dict(
            pano_feat=tm("pano_feat"), view_index=tm("view_index"),
            cand_point=tm("cand_point"), cand_ang=tm("cand_ang"),
            obj_fts=tm("obj_fts"), obj_angs=tm("obj_angs"),
            obj_pos=tm("obj_pos"), obj_mask=tm("obj_mask"),
            action=tm("actions"), live=tm("step_mask"),
            t=jnp.arange(t_steps, dtype=jnp.int32),
            key=jax.vmap(lambda t: step_key(rng, t))(jnp.arange(t_steps)),
        )

        def body(carry, x):
            hist_cache, hist_len = carry
            k_plan, k_critic, k_hist, _ = jax.random.split(x["key"], 4)
            ob = expand_obs(x["pano_feat"], x["view_index"],
                            x["cand_point"], x["cand_ang"])
            act_logits, obj_logits, state = apply(
                txt_embeds, txt_mask, hist_cache, _hist_mask(hist_len, h_max),
                ob["ob_img"], ob["ob_ang"], ob["ob_nav"], ob["ob_mask"],
                x["obj_fts"], x["obj_angs"], x["obj_pos"], x["obj_mask"],
                deterministic, method=HAMT.plan_ref, rngs={"dropout": k_plan},
            )
            logits = _full_logits(act_logits, obj_logits, stop_slot)
            value = critic.apply({"params": cparams}, state, deterministic,
                                 rngs={"dropout": k_critic})
            n_ob = ob["ob_ang"].shape[1]
            gather_a = jnp.where(x["action"] >= n_ob, stop_slot, x["action"])
            act_ang = jnp.take_along_axis(
                ob["ob_ang"], gather_a[:, None, None], axis=1
            ).squeeze(1)
            new_tok = apply(
                ob["hist_img"], act_ang, x["t"], ob["pano_img"],
                ob["pano_ang"], deterministic, method=HAMT.encode_history,
                rngs={"dropout": k_hist},
            )
            hist_cache = jax.lax.dynamic_update_slice(
                hist_cache, new_tok[:, None, :].astype(hist_cache.dtype),
                (0, x["t"] + 1, 0),
            )
            hist_len = hist_len + x["live"].astype(jnp.int32)
            return (hist_cache, hist_len), (logits, obj_logits, state, value)

        scan_body = remat_scan_body(body, cfg)
        (hist_cache, hist_len), (logits, obj_logits, states, values) = (
            jax.lax.scan(scan_body, (hist_cache, hist_len), xs)
        )

        if "final_pano_feat" in ep:
            k_plan, k_critic = jax.random.split(
                jax.random.fold_in(rng, FINAL_KEY_SALT))
            ob = expand_obs(ep["final_pano_feat"], ep["final_view_index"],
                            ep["final_cand_point"], ep["final_cand_ang"])
            _, _, last_state = apply(
                txt_embeds, txt_mask, hist_cache, _hist_mask(hist_len, h_max),
                ob["ob_img"], ob["ob_ang"], ob["ob_nav"], ob["ob_mask"],
                ep["final_obj_fts"], ep["final_obj_angs"],
                ep["final_obj_pos"], ep["final_obj_mask"], deterministic,
                method=HAMT.plan_ref, rngs={"dropout": k_plan},
            )
            last_value = jax.lax.stop_gradient(
                critic.apply({"params": cparams}, last_state, deterministic,
                             rngs={"dropout": k_critic})
            )
        else:
            last_value = jnp.zeros((b,), jnp.float32)

        return EpisodeOutputs(logits=logits, states=states, values=values,
                              last_value=last_value, hist_cache=hist_cache), obj_logits

    return episode_forward


def build_packed_ref_il_forward(model: HAMT, cfg, stop_slot: int):
    """Teacher-forced ``plan_ref`` forward over a PACKED episode grid.

    The REVERIE twin of ``rollout.build_packed_il_forward``: several
    dual-target teacher episodes ride each scan slot back to back
    (agents/packing.py:ReveriePackedILStream) — per-cell ``ep_id``
    selects the slot's text encoding, ``is_start`` cells reset the
    slot's history cache, history tokens are written at the episode-
    LOCAL position. Object features/positions/masks are node-aligned
    table gathers and relative object angles come from the (36, 36, A)
    table, exactly as in ``build_ref_episode_forward``, so per-episode
    logits match the unpacked scan's (tests/test_packed_il.py).

    Returns packed_forward(params, pack, rng, deterministic, feat_table,
    obj_tables) -> (logits (T, S, N+1), obj_logits (T, S, O)).
    """
    from .rollout import make_expand_obs

    expand_obs = make_expand_obs(36, cfg.angle_feat_size)
    ang_tab = _obj_angle_table(cfg.angle_feat_size)

    def packed_forward(params, pack, rng, deterministic: bool = False,
                       feat_table=None, obj_tables=None):
        pack = dict(pack)
        ni = pack["node_idx"]  # (S, T)
        pack["pano_feat"] = feat_table[ni]
        pack["obj_fts"] = obj_tables["fts"][ni]
        pack["obj_pos"] = obj_tables["pos"][ni]
        om = obj_tables["mask"][ni]
        ov = obj_tables["view"][ni]
        pack["obj_mask"] = om
        pack["obj_angs"] = jnp.where(
            om[..., None], ang_tab[pack["view_index"][..., None], ov], 0.0)
        s, t_steps = pack["actions"].shape
        h_max = t_steps + 1

        apply = partial(model.apply, {"params": params})
        txt_all = apply(pack["txt_ids"], pack["txt_mask"], deterministic,
                        method=HAMT.encode_text,
                        rngs={"dropout": jax.random.fold_in(rng, TXT_KEY_SALT)})
        txt_mask_all = pack["txt_mask"]
        hist0 = apply(s, deterministic, method=HAMT.init_history,
                      rngs={"dropout": jax.random.fold_in(rng, HIST0_KEY_SALT)})
        reset_cache = jnp.zeros((s, h_max, cfg.hidden_size), hist0.dtype)
        reset_cache = reset_cache.at[:, 0].set(hist0)

        tm = lambda name: jnp.moveaxis(pack[name], 0, 1)
        xs = dict(
            pano_feat=tm("pano_feat"), view_index=tm("view_index"),
            cand_point=tm("cand_point"), cand_ang=tm("cand_ang"),
            obj_fts=tm("obj_fts"), obj_angs=tm("obj_angs"),
            obj_pos=tm("obj_pos"), obj_mask=tm("obj_mask"),
            action=tm("actions"), live=tm("live"), ep_id=tm("ep_id"),
            local_t=tm("local_t"), is_start=tm("is_start"),
            key=jax.vmap(lambda t: step_key(rng, t))(jnp.arange(t_steps)),
        )

        def body(carry, x):
            hist_cache, hist_len = carry
            k_plan, _k_critic, k_hist, _ = jax.random.split(x["key"], 4)
            start = x["is_start"]
            hist_cache = jnp.where(start[:, None, None], reset_cache,
                                   hist_cache)
            hist_len = jnp.where(start, 1, hist_len)
            if txt_all.ndim == 4:  # no_lang_ca per-layer stack (X+1,E,L,D)
                txt_e = txt_all[:, x["ep_id"]]
            else:
                txt_e = txt_all[x["ep_id"]]
            txt_m = txt_mask_all[x["ep_id"]]
            ob = expand_obs(x["pano_feat"], x["view_index"],
                            x["cand_point"], x["cand_ang"])
            act_logits, obj_logits, _state = apply(
                txt_e, txt_m, hist_cache, _hist_mask(hist_len, h_max),
                ob["ob_img"], ob["ob_ang"], ob["ob_nav"], ob["ob_mask"],
                x["obj_fts"], x["obj_angs"], x["obj_pos"], x["obj_mask"],
                deterministic, method=HAMT.plan_ref, rngs={"dropout": k_plan},
            )
            logits = _full_logits(act_logits, obj_logits, stop_slot)
            n_ob = ob["ob_ang"].shape[1]
            gather_a = jnp.where(x["action"] >= n_ob, stop_slot, x["action"])
            act_ang = jnp.take_along_axis(
                ob["ob_ang"], gather_a[:, None, None], axis=1
            ).squeeze(1)
            new_tok = apply(
                ob["hist_img"], act_ang, x["local_t"], ob["pano_img"],
                ob["pano_ang"], deterministic, method=HAMT.encode_history,
                rngs={"dropout": k_hist},
            )
            pos = x["local_t"] + 1
            write = ((jnp.arange(h_max)[None, :] == pos[:, None])
                     & x["live"][:, None])
            hist_cache = jnp.where(
                write[:, :, None],
                new_tok[:, None, :].astype(hist_cache.dtype), hist_cache)
            hist_len = hist_len + x["live"].astype(jnp.int32)
            return (hist_cache, hist_len), (logits, obj_logits)

        scan_body = remat_scan_body(body, cfg)
        hist_len0 = jnp.ones((s,), jnp.int32)
        _, (logits, obj_logits) = jax.lax.scan(
            scan_body, (reset_cache, hist_len0), xs)
        return logits, obj_logits

    return packed_forward


class ReverieAgent(HAMTAgent):
    """Joint nav + grounding agent over :class:`ReverieNavEnv`."""

    #: object-grounded sampling rollout compiled into the device scan
    #: (rollout.py task='reverie'); parity-tested vs the host rollout
    device_rollout_task = "reverie"

    def __init__(self, cfg: HAMTConfig, env=None, seed: int = 0):
        assert cfg.model.obj_feat_size > 0, "REVERIE needs obj_feat_size > 0"
        super().__init__(cfg, env, seed=seed)
        mcfg = cfg.model
        self.ref_stop = self.num_ob_tokens  # appended obj-stop slot
        self.num_actions = self.num_ob_tokens + 1
        self.policy_step_ref = build_ref_policy_step(
            self.model, self.critic, mcfg)
        self.episode_forward_ref = build_ref_episode_forward(
            self.model, self.critic, mcfg, self.stop_slot)
        self._ref_il_rl_update = jax.jit(self._ref_il_rl_update_fn)
        self._ref_il_update = jax.jit(self._ref_il_update_fn)
        self._obj_tables = None  # device object tables (feature-table mode)

    def enable_packed_il(self, text_cap=None) -> None:
        """Packed IL for REVERIE: dual act+obj CE over the packed
        ``plan_ref`` forward (``build_packed_ref_il_forward``); episodes
        carry the extra ``ref_teacher`` grid
        (packing.py:ReveriePackedILStream). Same estimator per episode
        as the unpacked ``_ref_il_loss`` (tests/test_packed_il.py).
        Requires feature-table transport (pano AND object tables)."""
        assert (self._feat_table is not None
                and self._obj_tables is not None
                and self.env.feat_offsets is not None), (
            "REVERIE packed IL needs feature-table transport "
            "(enable_feature_table builds the pano + object tables)")
        self._packed_text_cap = text_cap
        self._packers: Dict[int, Any] = {}
        self._packed_il_forward = build_packed_ref_il_forward(
            self.model, self.cfg.model, self.stop_slot)
        self._packed_il_update = jax.jit(self._packed_il_update_fn)
        self.packed_il = True

    def _make_packer(self, env):
        from .packing import ReveriePackedILStream

        return ReveriePackedILStream(env, self,
                                     text_cap=self._packed_text_cap)

    def _packed_il_loss(self, params, pack, rng, weight, feat_table,
                        obj_tables):
        logits, obj_logits = self._packed_il_forward(
            params, pack, rng, deterministic=False,
            feat_table=feat_table, obj_tables=obj_tables)
        teacher = jnp.moveaxis(pack["teacher"], 0, 1)        # (T, S)
        ref_teacher = jnp.moveaxis(pack["ref_teacher"], 0, 1)
        # dual summed CE over the live cells / packed episode count —
        # the unpacked _ref_il_loss divides the same sums by ITS batch
        # size (= its episode count)
        loss = (il_loss(logits, teacher, IGNORE_ID)
                + il_loss(obj_logits, ref_teacher, IGNORE_ID)) \
            * weight / pack["n_episodes"]
        return loss, {"IL_loss": loss}

    def _packed_il_update_fn(self, state_params, state_cparams, opt_state,
                             copt_state, pack, rng, il_weight,
                             feat_table=None, obj_tables=None):
        import optax

        def loss_fn(params, cparams):
            del cparams  # critic unused by IL; decay-only update below
            return self._packed_il_loss(params, pack, rng, il_weight,
                                        feat_table, obj_tables)

        (loss, aux), (gp, gc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state_params, state_cparams)
        updates, opt_state = self.tx.update(gp, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        cupdates, copt_state = self.ctx.update(gc, copt_state, state_cparams)
        cparams = optax.apply_updates(state_cparams, cupdates)
        return params, cparams, opt_state, copt_state, loss, aux

    def enable_feature_table(self, env=None) -> None:
        """Feature-table transport for REVERIE: the pano table plus a
        node-aligned object table (features/view-index/bbox-pos/mask),
        so episodes and policy steps ship only (B[,T]) int32 rows."""
        from ..data.feature_db import build_object_table

        super().enable_feature_table(env)
        env = env or self.env
        tables, offsets = build_object_table(
            env.graphs, env.obj_db, env.max_objects, env.obj_feat_size,
            env._obj_local_pos)
        assert offsets == env.feat_offsets  # same sorted-scan layout
        fd = self._feat_dtype()
        self._obj_tables = {
            "fts": jax.device_put(jnp.asarray(tables["fts"], fd)),
            "view": jax.device_put(jnp.asarray(tables["view"])),
            "pos": jax.device_put(jnp.asarray(tables["pos"])),
            "mask": jax.device_put(jnp.asarray(tables["mask"])),
        }
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            self._obj_tables = replicate(self._obj_tables, self.mesh)

    # ----------------------------------------------- device rollout
    def _device_rollout_inputs(self, env, obs) -> Dict[str, np.ndarray]:
        # nDTW ref costs (base) + the multi-goal distance slab: min over
        # object-visible viewpoints (reverie/env.py:206-214), 0.0 when
        # the object has none (matching ReverieNavEnv._observe)
        ins = super()._device_rollout_inputs(env, obs)
        b = obs.batch_size
        slab = np.full((b, self._n_scan_max), np.inf, np.float32)
        for i, item in enumerate(env.batch):
            g = env.graphs[item["scan"]]
            vps = env._goal_viewpoints(item["scan"], item["objId"])
            if vps:
                idx = [g.index(v) for v in vps]
                slab[i, : g.num_nodes] = (g.dist[:, idx].min(axis=1)
                                          if len(idx) > 1
                                          else g.dist[:, idx[0]])
            else:
                slab[i, : g.num_nodes] = 0.0
        ins["goal_cost"] = slab
        return ins

    # ----------------------------------------------- packed eval hooks
    def _packed_policy_step(self, g, step_ins, use_table):
        obs = g.obs
        if use_table:
            extra = dict(obj_fts=None, obj_angs=None, obj_pos=None,
                         obj_mask=None, obj_tables=self._obj_tables)
        else:
            extra = dict(obj_fts=jnp.asarray(obs.obj_fts),
                         obj_angs=jnp.asarray(obs.obj_angs),
                         obj_pos=jnp.asarray(obs.obj_pos),
                         obj_mask=jnp.asarray(obs.obj_mask))
        (a_dev, _, obj_logits, _, g.hist_cache,
         g.hist_len) = self.policy_step_ref(
            self.state.params, self.state.cparams, g.txt_embeds,
            jnp.asarray(g.txt_mask), g.hist_cache, g.hist_len,
            jnp.asarray(np.minimum(g.t_vec, g.t_max - 1)),
            rng=self._next_rng(), mode="argmax", deterministic=True,
            feat_table=self._feat_table if use_table else None,
            **extra, **step_ins,
        )
        return a_dev, obj_logits

    def _packed_env_actions(self, a_t, active):
        # candidate moves only (reverie/agent.py:285-287)
        return np.where(active & (a_t < self.stop_slot), a_t, -1)

    def _packed_slot_done(self, st, g, i, a_t_i, steps):
        done = (a_t_i >= self.num_ob_tokens
                or steps >= g.env.max_action_len)
        if done and "predObjId" not in st:
            # predicted object at (forced) stop (agent.py:298-304)
            ids = g.obs.obj_ids[i]
            if not ids:
                st["predObjId"] = str(None)
            else:
                obj_np = g.aux_np()
                st["predObjId"] = str(
                    ids[int(np.argmax(obj_np[i, : len(ids)]))])
        return done

    def _packed_slot_result(self, st, pred):
        pred["predObjId"] = st.get("predObjId", str(None))

    def _fetch_decode_extras(self, extras) -> dict:
        # (T, B) -> (B, T): decode extras must be BATCH-leading so the
        # base class's sharded-feed row slice cuts the right axis
        return {"obj_pred": self._fetch(extras["obj_pred"]).T}

    def _decode_device_extras(self, pred, env, i, node, view, actions,
                              mask, extras_np) -> None:
        """Device-scan eval: grounded object at the (forced) stop step
        (host twin above: a_t >= num_ob_tokens or t == t_max-1). The
        scan records per-step argmax over the masked object logits;
        the host maps it through the node's obj-id list."""
        op = extras_np["obj_pred"]
        n_ob = self.num_ob_tokens
        t_max = actions.shape[1]
        stop_t = t_max - 1
        for t in range(t_max):
            if mask[i, t] and actions[i, t] >= n_ob:
                stop_t = t
                break
        item = env.batch[i]
        g = env.graphs[item["scan"]]
        off = env.feat_offsets[item["scan"]]
        entry = env.obj_db.get(
            (item["scan"], g.node_ids[int(node[i, stop_t]) - off]))
        ids = (list(entry["obj_ids"][: env.max_objects])
               if entry is not None else [])
        idx = int(op[i, stop_t])
        pred["predObjId"] = str(ids[idx]) if idx < len(ids) else str(None)

    def _fused_il_loss(self, params, cparams, il_ep, il_rng, weight,
                       feat_table, obj_tables):
        return self._ref_il_loss(params, cparams, il_ep, il_rng, weight,
                                 feat_table, obj_tables)

    def _merged_il_loss(self, extras, il_ep, weight):
        """Dual CE (action + grounded object, reverie/agent.py:271-275)
        on the merged scan's IL lanes — the ref policy core computes
        both logit sets for every lane, so the object head's IL targets
        come free."""
        teacher = jnp.moveaxis(il_ep["teacher"], 0, 1)
        ref_teacher = jnp.moveaxis(il_ep["ref_teacher"], 0, 1)
        b_il = il_ep["actions"].shape[0]
        loss_act = il_loss(extras["il_logits"], teacher, IGNORE_ID)
        loss_ref = il_loss(extras["il_obj_logits"], ref_teacher, IGNORE_ID)
        return (loss_act + loss_ref) * weight / b_il

    # ------------------------------------------------------------ losses
    def _ref_il_loss(self, params, cparams, ep, rng, weight,
                     feat_table=None, obj_tables=None):
        out, obj_logits = self.episode_forward_ref(
            params, cparams, ep, rng, deterministic=False,
            feat_table=feat_table, obj_tables=obj_tables)
        teacher = jnp.moveaxis(ep["teacher"], 0, 1)  # (T, B)
        ref_teacher = jnp.moveaxis(ep["ref_teacher"], 0, 1)  # (T, B)
        b = ep["actions"].shape[0]
        loss_act = il_loss(out.logits, teacher, IGNORE_ID)
        loss_ref = il_loss(obj_logits, ref_teacher, IGNORE_ID)
        loss = (loss_act + loss_ref) * weight / b
        return loss, {"IL_loss": loss}

    def _ref_rl_loss(self, params, cparams, ep, rewards, masks,
                     bootstrap_mask, rng, feat_table=None, obj_tables=None):
        from .losses import a2c_loss

        out, _ = self.episode_forward_ref(
            params, cparams, ep, rng, deterministic=False,
            feat_table=feat_table, obj_tables=obj_tables)
        actions = jnp.moveaxis(ep["actions"], 0, 1)
        tcfg = self.cfg.train
        last_value = jnp.where(bootstrap_mask, out.last_value, 0.0)
        loss, aux = a2c_loss(out.logits, actions, out.values, rewards, masks,
                             last_value, gamma=tcfg.gamma,
                             entropy_weight=tcfg.entropy_loss_weight,
                             normalize=tcfg.normalize_loss)
        aux["RL_loss"] = loss
        return loss, aux

    def _ref_il_update_fn(self, params, cparams, opt_state, copt_state, ep,
                          rng, weight, feat_table=None, obj_tables=None):
        import optax

        def loss_fn(p, c):
            return self._ref_il_loss(p, c, ep, rng, weight, feat_table,
                                     obj_tables)

        (loss, aux), (gp, gc) = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                   has_aux=True)(params, cparams)
        updates, opt_state = self.tx.update(gp, opt_state, params)
        params = optax.apply_updates(params, updates)
        cupdates, copt_state = self.ctx.update(gc, copt_state, cparams)
        cparams = optax.apply_updates(cparams, cupdates)
        return params, cparams, opt_state, copt_state, loss, aux

    def _ref_il_rl_update_fn(self, params, cparams, opt_state, copt_state,
                             il_ep, il_rng, il_weight, rl_ep, rewards, masks,
                             bootstrap_mask, rl_rng, feat_table=None,
                             obj_tables=None):
        import optax

        def loss_fn(p, c):
            l1, a1 = self._ref_il_loss(p, c, il_ep, il_rng, il_weight,
                                       feat_table, obj_tables)
            l2, a2 = self._ref_rl_loss(p, c, rl_ep, rewards, masks,
                                       bootstrap_mask, rl_rng, feat_table,
                                       obj_tables)
            return l1 + l2, {**a1, **a2}

        (loss, aux), (gp, gc) = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                   has_aux=True)(params, cparams)
        updates, opt_state = self.tx.update(gp, opt_state, params)
        params = optax.apply_updates(params, updates)
        cupdates, copt_state = self.ctx.update(gc, copt_state, cparams)
        cparams = optax.apply_updates(cparams, cupdates)
        return params, cparams, opt_state, copt_state, loss, aux

    # ------------------------------------------------------- data plumbing
    def _ref_teacher_targets(self, obs: ObsBatch) -> Tuple[np.ndarray, np.ndarray]:
        """(teacher action with appended stop, GT object index).

        Parity: reverie/agent.py _teacher_action — stop maps to the
        appended slot; ref target is the GT objId's index among the
        viewpoint's candidate objects, IGNORE when absent.
        """
        b = obs.batch_size
        teacher = obs.teacher.copy()
        teacher = np.where(teacher == self.stop_slot, self.ref_stop, teacher)
        ref = np.full((b,), IGNORE_ID, np.int32)
        for i, item in enumerate(self.env.batch):
            want = str(item["objId"])
            for k, oid in enumerate(obs.obj_ids[i]):
                if str(oid) == want:
                    ref[i] = k
                    break
        return teacher.astype(np.int32), ref

    def _stack_ref_episode(self, obs_list, txt_ids, txt_mask, actions,
                           step_mask, teacher, ref_teacher, final_obs=None,
                           feat_offs=None):
        fd = self._feat_dtype()
        stack = lambda attr: np.stack([getattr(o, attr) for o in obs_list], axis=1)
        d = {
            "txt_ids": txt_ids, "txt_mask": txt_mask,
            "view_index": stack("view_index"),
            "cand_point": stack("cand_point"),
            "cand_ang": stack("cand_ang"),
            "actions": actions, "step_mask": step_mask,
            "teacher": teacher, "ref_teacher": ref_teacher,
        }
        if feat_offs is not None:
            # feature-table mode: (B, T) rows address the pano AND
            # object tables on device
            d["node_idx"] = np.stack(
                [feat_offs + o.node for o in obs_list], axis=1
            ).astype(np.int32)
        else:
            d.update(
                pano_feat=jnp.asarray(stack("pano_feat"), fd),
                obj_fts=stack("obj_fts"), obj_angs=stack("obj_angs"),
                obj_pos=stack("obj_pos"), obj_mask=stack("obj_mask"),
            )
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
                d.update(
                    final_pano_feat=jnp.asarray(final_obs.pano_feat, fd),
                    final_obj_fts=final_obs.obj_fts,
                    final_obj_angs=final_obs.obj_angs,
                    final_obj_pos=final_obs.obj_pos,
                    final_obj_mask=final_obs.obj_mask,
                )
        d = jax.tree.map(jnp.asarray, d)
        return self._shard_data(d, batch_size=actions.shape[0])

    # --------------------------------------------------------- rollout
    def interactive_rollout(self, mode, base_rng, deterministic,
                            record_for_replay=False, no_cand_backtrack=False):
        # same contract as the base host-loop rollout: per-process
        # control flow requires identical env replicas
        assert not self.host_sharded_feed, (
            "host-loop rollout needs identical-replica envs; sharded "
            "feeding supports the device-scan paths only")
        env = self.env
        stop = self.ref_stop
        use_table = getattr(env, "feat_offsets", None) is not None
        if use_table:
            assert self._feat_table is not None and self._obj_tables is not None
        obs = env.reset()
        feat_offs = (np.array([env.feat_offsets[it["scan"]]
                               for it in env.batch], np.int64)
                     if use_table else None)
        b = obs.batch_size
        t_max = env.max_action_len

        txt_ids, txt_mask = env.txt_batch()
        txt_ids, txt_mask = jnp.asarray(txt_ids), jnp.asarray(txt_mask)
        txt_embeds = self.encode_text(
            self.state.params, txt_ids, txt_mask,
            jax.random.fold_in(base_rng, TXT_KEY_SALT), deterministic)
        hist0 = self.init_history(
            self.state.params, jax.random.fold_in(base_rng, HIST0_KEY_SALT),
            batch_size=b, deterministic=deterministic)
        hist_cache = jnp.zeros((b, t_max + 1, self.cfg.model.hidden_size),
                               hist0.dtype).at[:, 0].set(hist0)
        hist_len = jnp.ones((b,), jnp.int32)

        graphs = [env.sim.graph(i) for i in range(b)]
        traj = [{"instr_id": env.batch[i]["instr_id"],
                 "path": [self._pose_tuple(env, i)]} for i in range(b)]
        ep_state = self._episode_state_init(obs, graphs, traj)
        ended = np.zeros((b,), bool)
        visited = [set([int(obs.node[i])]) for i in range(b)]

        obs_list: List[ObsBatch] = []
        actions_rec = np.full((b, t_max), stop, np.int32)
        teacher_rec = np.full((b, t_max), IGNORE_ID, np.int32)
        ref_teacher_rec = np.full((b, t_max), IGNORE_ID, np.int32)
        step_mask = np.zeros((b, t_max), bool)
        rewards = np.zeros((t_max, b), np.float32)
        logits_rec: List[np.ndarray] = []

        for t in range(t_max):
            obs_list.append(obs)
            teacher_t, ref_t = self._ref_teacher_targets(obs)
            forbid = np.zeros((b, self.num_ob_tokens + 1), bool)
            if no_cand_backtrack:
                for i in range(b):
                    for c in range(self.stop_slot):
                        cn = int(obs.cand_node[i, c])
                        if cn >= 0 and cn in visited[i]:
                            forbid[i, c] = True
            live = ~ended
            fd = self._feat_dtype()
            if use_table:
                feat_args = dict(
                    pano_feat=None, obj_fts=None, obj_angs=None,
                    obj_pos=None, obj_mask=None,
                    node_idx=jnp.asarray(
                        (feat_offs + obs.node).astype(np.int32)),
                    feat_table=self._feat_table,
                    obj_tables=self._obj_tables)
            else:
                feat_args = dict(
                    pano_feat=jnp.asarray(obs.pano_feat, fd),
                    obj_fts=jnp.asarray(obs.obj_fts),
                    obj_angs=jnp.asarray(obs.obj_angs),
                    obj_pos=jnp.asarray(obs.obj_pos),
                    obj_mask=jnp.asarray(obs.obj_mask))
            a_dev, logits, obj_logits, value, hist_cache, hist_len = (
                self.policy_step_ref(
                    self.state.params, self.state.cparams, txt_embeds,
                    txt_mask, hist_cache, hist_len, t,
                    view_index=jnp.asarray(obs.view_index),
                    cand_point=jnp.asarray(obs.cand_point),
                    cand_ang=jnp.asarray(obs.cand_ang),
                    live=jnp.asarray(live), forbid=jnp.asarray(forbid),
                    given_action=jnp.asarray(
                        teacher_t if mode == "teacher"
                        else np.zeros(b, np.int32)),
                    rng=step_key(base_rng, t), mode=mode,
                    deterministic=deterministic, **feat_args,
                )
            )
            a_t = self._fetch(a_dev)
            step_mask[:, t] = live
            actions_rec[:, t] = np.where(live, a_t, stop)
            teacher_rec[:, t] = np.where(live, teacher_t, IGNORE_ID)
            ref_teacher_rec[:, t] = np.where(live, ref_t, IGNORE_ID)
            if record_for_replay:
                logits_rec.append(self._fetch(logits))

            # record predObjId at (forced) stop (agent.py:298-304)
            obj_np = self._fetch(obj_logits)
            for i in range(b):
                stopping = live[i] and (a_t[i] >= self.num_ob_tokens
                                        or t == t_max - 1)
                if stopping and "predObjId" not in traj[i]:
                    ids = obs.obj_ids[i]
                    if not ids:
                        traj[i]["predObjId"] = str(None)
                    else:
                        traj[i]["predObjId"] = str(ids[int(np.argmax(
                            obj_np[i, : len(ids)]))])

            env_actions = np.where(live & (a_t < self.stop_slot), a_t, -1)
            obs = env.step(env_actions, obs)
            for i in range(b):
                if env_actions[i] >= 0:
                    traj[i]["path"].append(self._pose_tuple(env, i))
                    visited[i].add(int(obs.node[i]))
                    if "ndtw" in ep_state:
                        ep_state["ndtw"].update(i, int(obs.node[i]))

            if record_for_replay:
                a_eff = np.where(a_t >= self.num_ob_tokens, self.stop_slot, a_t)
                rewards[t] = self._reward_with_stop(a_eff, live, obs, ep_state)

            ended = ended | (a_t >= self.num_ob_tokens)
            if ended.all():
                break

        extras: Dict[str, Any] = {}
        if record_for_replay:
            while len(obs_list) < t_max:
                obs_list.append(obs_list[-1])
            ep = self._stack_ref_episode(
                obs_list, txt_ids, txt_mask, actions_rec, step_mask,
                teacher_rec, ref_teacher_rec, final_obs=obs,
                feat_offs=feat_offs)
            extras = {
                "ep": ep,
                "rewards": jnp.asarray(rewards),
                "masks": jnp.asarray(step_mask.T.astype(np.float32)),
                "bootstrap_mask": jnp.asarray(~ended),
                "rollout_logits": np.stack(logits_rec, axis=0),  # (T_used, B, N+1)
            }
        return traj, extras

    def _reward_with_stop(self, a_eff, live, obs, ep_state):
        return super()._step_rewards(0, a_eff, live, None, obs, ep_state)

    # ------------------------------------------------------------ train
    def train_iteration(self, feedback: Optional[str] = None,
                        sync: bool = True) -> Dict[str, Any]:
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
                    self._obj_tables)
                aux = {**aux, "episodes": n_eps}
            else:
                ep = self._ref_teacher_episode()
                rng = self._next_rng()
                params, cparams, opt_state, copt_state, loss, aux = (
                    self._ref_il_update(st.params, st.cparams, st.opt_state,
                                        st.copt_state, ep, rng,
                                        tcfg.teacher_weight,
                                        self._feat_table, self._obj_tables))
        elif feedback == "sample":
            il_ep = self._ref_teacher_episode()
            use_device = (self.device_rollout_rewards
                          and self._nav_tables is not None
                          and self.env.feat_offsets is not None)
            if use_device and self.merged_sample_update:
                # one scan: dual-CE IL lanes ride INSIDE the
                # object-grounded rollout scan. One joint rng draw —
                # the merged program folds IL and RL dropout keys from
                # the same base (PARITY.md #18), no host-side il_rng.
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
                    self._feat_table, self._nav_tables, self._obj_tables)
            elif use_device and self.fused_sample_update:
                # one program: dual-CE IL + object-grounded rollout WITH
                # grads + A2C + optimizer (no replay forward); two host
                # draws, bit-matching the rollout-then-replay path
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
                    self._feat_table, self._nav_tables, self._obj_tables)
            else:
                il_rng = self._next_rng()
                rl_rng = self._next_rng()
                if use_device:
                    # object-grounded sampling rollout as ONE device
                    # scan (rollout.py task='reverie'): per-step object
                    # rows are table gathers, no host round trips
                    rl_ep, dev_extras = self.device_rollout_iteration(rl_rng)
                    extras = {"ep": rl_ep, **dev_extras}
                else:
                    _, extras = self.interactive_rollout(
                        "sample", rl_rng, deterministic=False,
                        record_for_replay=True)
                params, cparams, opt_state, copt_state, loss, aux = (
                    self._ref_il_rl_update(
                        st.params, st.cparams, st.opt_state, st.copt_state,
                        il_ep, il_rng, tcfg.ml_weight, extras["ep"],
                        extras["rewards"], extras["masks"],
                        extras["bootstrap_mask"], rl_rng,
                        self._feat_table, self._obj_tables))
        else:
            raise ValueError(feedback)
        from .agent import TrainState

        self.state = TrainState(params, cparams, opt_state, copt_state,
                                st.step + 1)
        if not sync:
            return {"loss": loss, **aux}
        out = {"loss": float(loss)}
        for k, v in aux.items():
            out[k] = float(np.asarray(v)) if np.ndim(v) == 0 else float(np.mean(v))
        return out

    def _ref_teacher_episode(self):
        """Teacher-forced episode with object arrays and dual targets."""
        env = self.env
        use_table = getattr(env, "feat_offsets", None) is not None
        obs = env.reset()
        feat_offs = (np.array([env.feat_offsets[it["scan"]]
                               for it in env.batch], np.int64)
                     if use_table else None)
        b = obs.batch_size
        t_max = env.max_action_len
        stop = self.ref_stop

        obs_list: List[ObsBatch] = []
        actions = np.full((b, t_max), stop, np.int32)
        teacher = np.full((b, t_max), IGNORE_ID, np.int32)
        ref_teacher = np.full((b, t_max), IGNORE_ID, np.int32)
        step_mask = np.zeros((b, t_max), bool)
        ended = np.zeros((b,), bool)

        for t in range(t_max):
            obs_list.append(obs)
            teacher_t, ref_t = self._ref_teacher_targets(obs)
            live = ~ended
            step_mask[:, t] = live
            teacher[:, t] = np.where(live, teacher_t, IGNORE_ID)
            ref_teacher[:, t] = np.where(live, ref_t, IGNORE_ID)
            actions[:, t] = np.where(live, teacher_t, stop)
            env_actions = np.where(live & (teacher_t < self.stop_slot),
                                   teacher_t, -1)
            ended = ended | (teacher_t == stop)
            if t + 1 < t_max:
                obs = env.step(env_actions, obs)
                if ended.all():
                    break
        while len(obs_list) < t_max:
            obs_list.append(obs_list[-1])

        txt_ids, txt_mask = env.txt_batch()
        return self._stack_ref_episode(obs_list, txt_ids, txt_mask, actions,
                                       step_mask, teacher, ref_teacher,
                                       feat_offs=feat_offs)
