"""Jitted episode computation.

The reference interleaves per-step GPU forwards with Python list
appends and simulator calls (``agent_cmt.py:248-529``, SURVEY §3.1).
Here the episode is one device program:

- :func:`build_episode_forward` returns a function that runs the FULL
  episode as a ``lax.scan`` over time with a fixed-size history cache
  updated via ``dynamic_update_slice``. It is differentiable end-to-end
  and serves both IL (teacher actions) and RL (replaying recorded
  actions: identical per-step dropout keys make the replayed logits
  bit-equal to the rollout logits, so log-probs/gradients match the
  sampled trajectory exactly).
- :func:`build_policy_step` returns the single-step jitted function used
  for interactive rollouts (RL sampling, greedy eval): one H2D upload of
  the observation, one D2H download of the action per step; the history
  cache lives on device across steps (donated buffers).

History cache invariant: live steps form a prefix of the episode, so
the token written at scan step ``t`` always lands in slot ``t+1`` and
per-sample history length is ``1 + (# live steps so far)`` — masked
attention reproduces the reference's per-sample ``hist_lens``
bookkeeping (agent_cmt.py:305-306,399-401) without ragged shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from ..models.hamt import HAMT, Critic


# Key-derivation scheme shared by interactive rollout and scan replay so
# replayed logits are bit-identical to rollout logits (same dropout):
#   step t        -> fold_in(base, t)
#   text encoding -> fold_in(base, TXT_KEY_SALT)
#   history [CLS] -> fold_in(base, HIST0_KEY_SALT)
#   final bootstrap plan -> fold_in(base, FINAL_KEY_SALT)
TXT_KEY_SALT = 1_000_000
HIST0_KEY_SALT = 1_000_001
FINAL_KEY_SALT = 1_000_002


def step_key(base: jax.Array, t) -> jax.Array:
    return jax.random.fold_in(base, t)


def remat_scan_body(body, cfg: ModelConfig):
    """Apply the configured rematerialization to an episode-scan body.

    ``remat_policy="full"`` recomputes the whole step forward in the
    backward pass (O(1) stored activations per step, ~4/3x FLOPs).
    ``"dots"`` saves matmul outputs across the boundary
    (``dots_with_no_batch_dims_saveable``) so the backward recomputes
    only elementwise/attention work — numerically identical (the
    recompute is deterministic, incl. dropout bits: keys are re-derived
    from the same fold_in). Measured on the real v5e: "dots" is a net
    LOSS at production shapes (HBM-traffic-bound, ModelConfig comment +
    BASELINE.md), so "full" is the default.
    """
    if not cfg.remat:
        return body
    if cfg.remat_policy == "dots":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if cfg.remat_policy != "full":
        raise ValueError(f"unknown remat_policy: {cfg.remat_policy!r}")
    return jax.checkpoint(body)


@dataclasses.dataclass
class EpisodeOutputs:
    logits: jnp.ndarray  # (T, B, N) float32
    states: jnp.ndarray  # (T, B, D)
    values: jnp.ndarray  # (T, B)
    last_value: jnp.ndarray  # (B,) bootstrap value of the final obs
    hist_cache: jnp.ndarray  # (B, T+1, D) final history cache


def _hist_mask(hist_len: jnp.ndarray, h: int) -> jnp.ndarray:
    return jnp.arange(h)[None, :] < hist_len[:, None]


def make_expand_obs(views: int, angle_feat_size: int, ob_type: str = "pano"):
    """Device-side expansion of compact observations.

    Host ships only the (B, V, D) panorama feature matrix + candidate
    index/angle tables (see env/observation.py); the full fixed layout
    [candidates | STOP | panorama] is gathered on device — ~4x less H2D
    payload and no host-side feature copying. Must match
    ``expand_obs_np`` exactly (tested).
    """
    from ..data.angle import all_point_angle_feature

    table = jnp.asarray(all_point_angle_feature(angle_feat_size))  # (36,36,A)

    def expand_obs(pano_feat, view_index, cand_point, cand_ang):
        lead = pano_feat.shape[:-2]
        d = pano_feat.shape[-1]
        a = cand_ang.shape[-1]
        dtype = pano_feat.dtype

        valid = cand_point >= 0
        idx = jnp.where(valid, cand_point, 0)
        cand_feats = jnp.take_along_axis(pano_feat, idx[..., None], axis=-2)
        cand_feats = jnp.where(valid[..., None], cand_feats, 0)
        stop_img = jnp.zeros(lead + (1, d), dtype)
        ob_img = jnp.concatenate([cand_feats, stop_img, pano_feat], axis=-2)

        pano_ang = table[view_index].astype(dtype)  # (..., V, A)
        stop_ang = jnp.zeros(lead + (1, a), dtype)
        ob_ang = jnp.concatenate(
            [jnp.where(valid[..., None], cand_ang.astype(dtype), 0),
             stop_ang, pano_ang], axis=-2)

        nav_c = valid.astype(jnp.int32)
        ob_nav = jnp.concatenate(
            [nav_c, jnp.full(lead + (1,), 2, jnp.int32),
             jnp.zeros(lead + (views,), jnp.int32)], axis=-1)

        onehot = (idx[..., None] == jnp.arange(views)) & valid[..., None]
        claimed = onehot.any(axis=-2)
        if ob_type == "cand":
            pano_region = jnp.zeros(lead + (views,), bool)
        else:
            pano_region = ~claimed
        ob_mask = jnp.concatenate(
            [valid, jnp.ones(lead + (1,), bool), pano_region], axis=-1)

        hist_img = jnp.take_along_axis(
            pano_feat, view_index[..., None, None], axis=-2).squeeze(-2)

        return dict(ob_img=ob_img, ob_ang=ob_ang, ob_nav=ob_nav,
                    ob_mask=ob_mask, hist_img=hist_img,
                    pano_img=pano_feat, pano_ang=pano_ang)

    return expand_obs


def build_episode_forward(
    model: HAMT, critic: Critic, cfg: ModelConfig, ob_type: str = "pano"
) -> Callable[..., EpisodeOutputs]:
    """Returns episode_forward(params, cparams, ep, rng, deterministic).

    ``ep`` is a dict of device arrays (compact observation schema; see
    env/observation.py):
      txt_ids (B, L) int32, txt_mask (B, L) bool,
      pano_feat (B, T, V, Di), view_index (B, T) int32,
      cand_point (B, T, C) int32, cand_ang (B, T, C, A),
      actions (B, T) int32 (action slots TAKEN; STOP slot when ended),
      step_mask (B, T) bool,
      final_pano_feat / final_view_index / final_cand_point /
      final_cand_ang optional — the obs after the last action for the RL
      bootstrap value; when absent, last_value = 0.
    """

    expand_obs = make_expand_obs(36, cfg.angle_feat_size, ob_type)

    def episode_forward(params, cparams, ep: Dict[str, jnp.ndarray], rng,
                        deterministic: bool = False,
                        feat_table=None) -> EpisodeOutputs:
        if "node_idx" in ep:
            # feature-table mode: one on-device gather materializes the
            # (B, T, V, D) pano stack from the resident table; the host
            # shipped only (B, T) indices
            ep = dict(ep)
            ep["pano_feat"] = feat_table[ep["node_idx"]]
            if "final_node_idx" in ep:
                ep["final_pano_feat"] = feat_table[ep["final_node_idx"]]
        txt_ids, txt_mask = ep["txt_ids"], ep["txt_mask"]
        b, t_steps = ep["actions"].shape
        h_max = t_steps + 1

        txt_key = jax.random.fold_in(rng, TXT_KEY_SALT)
        hist0_key = jax.random.fold_in(rng, HIST0_KEY_SALT)
        apply = partial(model.apply, {"params": params})

        txt_embeds = apply(
            txt_ids, txt_mask, deterministic,
            method=HAMT.encode_text, rngs={"dropout": txt_key},
        )
        hist0 = apply(b, deterministic, method=HAMT.init_history,
                      rngs={"dropout": hist0_key})

        hist_cache = jnp.zeros((b, h_max, cfg.hidden_size), hist0.dtype)
        hist_cache = hist_cache.at[:, 0].set(hist0)
        hist_len = jnp.ones((b,), jnp.int32)

        # time-major leaves for scan (compact obs; expansion in-body)
        tm = lambda name: jnp.moveaxis(ep[name], 0, 1)
        xs = dict(
            pano_feat=tm("pano_feat"), view_index=tm("view_index"),
            cand_point=tm("cand_point"), cand_ang=tm("cand_ang"),
            action=tm("actions"), live=tm("step_mask"),
            t=jnp.arange(t_steps, dtype=jnp.int32),
            key=jax.vmap(lambda t: step_key(rng, t))(jnp.arange(t_steps)),
        )

        def body(carry, x):
            hist_cache, hist_len = carry
            k_plan, k_critic, k_hist, _ = jax.random.split(x["key"], 4)
            ob = expand_obs(x["pano_feat"], x["view_index"],
                            x["cand_point"], x["cand_ang"])
            logits, state = apply(
                txt_embeds, txt_mask, hist_cache, _hist_mask(hist_len, h_max),
                ob["ob_img"], ob["ob_ang"], ob["ob_nav"], ob["ob_mask"],
                deterministic, method=HAMT.plan, rngs={"dropout": k_plan},
            )
            value = critic.apply({"params": cparams}, state, deterministic,
                                 rngs={"dropout": k_critic})
            # chosen action's angle feature = its ob slot's angle feature
            # (zeros at the STOP slot), parity agent_cmt.py:382-386
            act_ang = jnp.take_along_axis(
                ob["ob_ang"], x["action"][:, None, None], axis=1
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
            return (hist_cache, hist_len), (logits, state, value)

        scan_body = remat_scan_body(body, cfg)
        (hist_cache, hist_len), (logits, states, values) = jax.lax.scan(
            scan_body, (hist_cache, hist_len), xs
        )

        if "final_pano_feat" in ep:
            k_plan, k_critic = jax.random.split(
                jax.random.fold_in(rng, FINAL_KEY_SALT)
            )
            ob = expand_obs(ep["final_pano_feat"], ep["final_view_index"],
                            ep["final_cand_point"], ep["final_cand_ang"])
            _, last_state = apply(
                txt_embeds, txt_mask, hist_cache, _hist_mask(hist_len, h_max),
                ob["ob_img"], ob["ob_ang"], ob["ob_nav"], ob["ob_mask"],
                deterministic, method=HAMT.plan, rngs={"dropout": k_plan},
            )
            last_value = critic.apply({"params": cparams}, last_state,
                                      deterministic, rngs={"dropout": k_critic})
            last_value = jax.lax.stop_gradient(last_value)
        else:
            last_value = jnp.zeros((b,), jnp.float32)

        return EpisodeOutputs(
            logits=logits, states=states, values=values,
            last_value=last_value, hist_cache=hist_cache,
        )

    return episode_forward


# ----------------------------------------------------------------------
def build_packed_il_forward(model: HAMT, cfg: ModelConfig,
                            ob_type: str = "pano"):
    """Teacher-forced forward over a PACKED episode grid.

    Same per-step transformer as :func:`build_episode_forward`, but each
    scan slot carries several episodes back to back (agents/packing.py):
    per-cell ``ep_id`` selects the slot's text encoding for that step,
    ``is_start`` cells reset the slot's history cache to ``[hist0]``,
    and the history token is written at the episode-LOCAL position
    (one-hot scatter instead of the shared ``dynamic_update_slice``).
    For every packed episode the sequence of (text, history, obs) the
    model sees at each of its steps is identical to the unpacked scan's,
    so logits match per episode (tested) and the packed IL update is the
    same estimator at ~T/mean_len times the episodes per program.

    Returns packed_forward(params, pack, rng, deterministic, feat_table)
    -> logits (T, S, N). IL-only: no critic, no bootstrap obs.
    """

    expand_obs = make_expand_obs(36, cfg.angle_feat_size, ob_type)

    def packed_forward(params, pack: Dict[str, jnp.ndarray], rng,
                       deterministic: bool = False, feat_table=None):
        pack = dict(pack)
        if "node_idx" in pack:
            pack["pano_feat"] = feat_table[pack["node_idx"]]
        s, t_steps = pack["actions"].shape
        h_max = t_steps + 1

        txt_key = jax.random.fold_in(rng, TXT_KEY_SALT)
        hist0_key = jax.random.fold_in(rng, HIST0_KEY_SALT)
        apply = partial(model.apply, {"params": params})

        # one text encode over ALL packed episodes' instructions
        txt_all = apply(pack["txt_ids"], pack["txt_mask"], deterministic,
                        method=HAMT.encode_text, rngs={"dropout": txt_key})
        txt_mask_all = pack["txt_mask"]
        hist0 = apply(s, deterministic, method=HAMT.init_history,
                      rngs={"dropout": hist0_key})
        reset_cache = jnp.zeros((s, h_max, cfg.hidden_size), hist0.dtype)
        reset_cache = reset_cache.at[:, 0].set(hist0)

        tm = lambda name: jnp.moveaxis(pack[name], 0, 1)
        xs = dict(
            pano_feat=tm("pano_feat"), view_index=tm("view_index"),
            cand_point=tm("cand_point"), cand_ang=tm("cand_ang"),
            action=tm("actions"), live=tm("live"), ep_id=tm("ep_id"),
            local_t=tm("local_t"), is_start=tm("is_start"),
            key=jax.vmap(lambda t: step_key(rng, t))(
                jnp.arange(t_steps)),
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
            logits, _state = apply(
                txt_e, txt_m, hist_cache, _hist_mask(hist_len, h_max),
                ob["ob_img"], ob["ob_ang"], ob["ob_nav"], ob["ob_mask"],
                deterministic, method=HAMT.plan, rngs={"dropout": k_plan},
            )
            act_ang = jnp.take_along_axis(
                ob["ob_ang"], x["action"][:, None, None], axis=1
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
            return (hist_cache, hist_len), logits

        scan_body = remat_scan_body(body, cfg)
        hist_len0 = jnp.ones((s,), jnp.int32)
        _, logits = jax.lax.scan(scan_body, (reset_cache, hist_len0), xs)
        return logits  # (T, S, N) float32

    return packed_forward


# ----------------------------------------------------------------------
def build_policy_step(model: HAMT, critic: Critic, cfg: ModelConfig,
                      ob_type: str = "pano"):
    """Single interactive step, jitted with a donated history cache.

    policy_step(params, txt_embeds, txt_mask, hist_cache, hist_len, t,
                obs..., live, forbid, rng)
      -> action (B,), logits (B, N), new_hist_cache, new_hist_len

    ``mode``: 'sample' | 'argmax' | 'teacher' (action passed in via
    ``given_action``). ``forbid`` is an extra bool logit mask for
    no_cand_backtrack (agent_cmt.py:342-350).
    """

    expand_obs = make_expand_obs(36, cfg.angle_feat_size, ob_type)
    core = _make_policy_core(model, critic, expand_obs)

    @partial(
        jax.jit,
        static_argnames=("mode", "deterministic"),
        donate_argnames=("hist_cache",),
    )
    def policy_step(
        params, cparams, txt_embeds, txt_mask, hist_cache, hist_len, t,
        pano_feat, view_index, cand_point, cand_ang,
        live, forbid, given_action, rng,
        mode: str = "argmax", deterministic: bool = True,
        node_idx=None, feat_table=None,
    ):
        if node_idx is not None:
            # feature-table mode: (B,) row gather replaces the per-step
            # (B, V, D) host transfer
            pano_feat = feat_table[node_idx]
        return core(params, cparams, txt_embeds, txt_mask, hist_cache,
                    hist_len, t, pano_feat, view_index, cand_point, cand_ang,
                    live, forbid, given_action, rng, mode, deterministic)

    return policy_step


def _make_policy_core(model: HAMT, critic: Critic, expand_obs):
    """One interactive policy step as a pure function.

    Shared by the jitted single-step :func:`build_policy_step` (host
    loop) and by the fully device-resident rollout scan
    (:func:`build_device_rollout`) — sharing the body guarantees both
    produce bit-identical logits/actions for the same per-step rng.
    """

    def core(params, cparams, txt_embeds, txt_mask, hist_cache, hist_len, t,
             pano_feat, view_index, cand_point, cand_ang,
             live, forbid, given_action, rng,
             mode: str, deterministic: bool):
        h_max = hist_cache.shape[1]
        k_plan, k_critic, k_hist, k_act = jax.random.split(rng, 4)
        apply = partial(model.apply, {"params": params})
        ob = expand_obs(pano_feat, view_index, cand_point, cand_ang)
        logits, state = apply(
            txt_embeds, txt_mask, hist_cache, _hist_mask(hist_len, h_max),
            ob["ob_img"], ob["ob_ang"], ob["ob_nav"], ob["ob_mask"],
            deterministic, method=HAMT.plan, rngs={"dropout": k_plan},
        )
        masked_logits = jnp.where(forbid, -jnp.inf, logits)
        if mode == "sample":
            action = jax.random.categorical(k_act, masked_logits, axis=-1)
        elif mode == "argmax":
            action = jnp.argmax(masked_logits, axis=-1)
        elif mode == "teacher":
            action = given_action
        elif mode == "mixed":
            # per-lane: forced where given_action >= 0 (teacher/IL
            # lanes), sampled otherwise (RL lanes) — the merged
            # IL+rollout scan of build_device_rollout(il=...)
            sampled = jax.random.categorical(k_act, masked_logits, axis=-1)
            action = jnp.where(given_action >= 0, given_action, sampled)
        else:
            raise ValueError(mode)
        action = action.astype(jnp.int32)

        value = critic.apply({"params": cparams}, state, deterministic,
                             rngs={"dropout": k_critic})

        act_ang = jnp.take_along_axis(
            ob["ob_ang"], action[:, None, None], axis=1
        ).squeeze(1)
        new_tok = apply(
            ob["hist_img"], act_ang, t, ob["pano_img"], ob["pano_ang"],
            deterministic, method=HAMT.encode_history, rngs={"dropout": k_hist},
        )
        # per-sample write position: t may be a scalar (lock-step
        # rollout) or a (B,) vector (continuation-packed eval)
        b = hist_cache.shape[0]
        t_vec = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (b,))
        hist_cache = hist_cache.at[jnp.arange(b), t_vec + 1].set(
            new_tok.astype(hist_cache.dtype)
        )
        hist_len = hist_len + live.astype(jnp.int32)
        return action, logits, value, hist_cache, hist_len

    return core


def _full_logits(act_logits: jnp.ndarray, obj_logits: jnp.ndarray,
                 stop_slot: int) -> jnp.ndarray:
    """[act slots (layout STOP masked) ; max-obj logit] — the REVERIE
    action space (reverie/agent.py:251-254)."""
    act = act_logits.at[:, stop_slot].set(-jnp.inf)
    max_obj = jnp.max(obj_logits, axis=-1, keepdims=True)
    # guard: a viewpoint with zero objects would make stopping
    # impossible and the softmax degenerate; fall back to logit 0
    max_obj = jnp.where(jnp.isfinite(max_obj), max_obj, 0.0)
    return jnp.concatenate([act, max_obj], axis=1)


def _obj_angle_table(angle_feat_size: int):
    from ..data.angle import all_point_angle_feature

    return jnp.asarray(all_point_angle_feature(angle_feat_size))


def _make_ref_policy_core(model: HAMT, critic, cfg: ModelConfig):
    """REVERIE policy step (plan_ref + object grounding) as a pure
    function — shared by the host ``build_ref_policy_step`` and the
    device rollout scan (task='reverie'), so both produce bit-identical
    logits/actions for the same per-step rng (same invariant as
    :func:`_make_policy_core`)."""

    expand_obs = make_expand_obs(36, cfg.angle_feat_size)

    def core(params, cparams, txt_embeds, txt_mask, hist_cache, hist_len, t,
             pano_feat, view_index, cand_point, cand_ang,
             obj_fts, obj_angs, obj_pos, obj_mask,
             live, forbid, given_action, rng,
             mode: str, deterministic: bool):
        h_max = hist_cache.shape[1]
        k_plan, k_critic, k_hist, k_act = jax.random.split(rng, 4)
        apply = partial(model.apply, {"params": params})
        ob = expand_obs(pano_feat, view_index, cand_point, cand_ang)
        ob_ang = ob["ob_ang"]
        n_ob = ob_ang.shape[1]
        stop_slot = n_ob - 1 - 36  # [C cands | STOP | 36 pano views]
        act_logits, obj_logits, state = apply(
            txt_embeds, txt_mask, hist_cache, _hist_mask(hist_len, h_max),
            ob["ob_img"], ob["ob_ang"], ob["ob_nav"], ob["ob_mask"],
            obj_fts, obj_angs, obj_pos, obj_mask, deterministic,
            method=HAMT.plan_ref, rngs={"dropout": k_plan},
        )
        logits = _full_logits(act_logits, obj_logits, stop_slot)
        masked_logits = jnp.where(forbid, -jnp.inf, logits)
        if mode == "sample":
            action = jax.random.categorical(k_act, masked_logits, axis=-1)
        elif mode == "argmax":
            action = jnp.argmax(masked_logits, axis=-1)
        elif mode == "teacher":
            action = given_action
        elif mode == "mixed":
            sampled = jax.random.categorical(k_act, masked_logits, axis=-1)
            action = jnp.where(given_action >= 0, given_action, sampled)
        else:
            raise ValueError(mode)
        action = action.astype(jnp.int32)

        value = critic.apply({"params": cparams}, state, deterministic,
                             rngs={"dropout": k_critic})
        # stop (appended slot) and layout STOP both have zero angle
        gather_a = jnp.where(action >= n_ob, stop_slot, action)
        act_ang = jnp.take_along_axis(
            ob_ang, gather_a[:, None, None], axis=1
        ).squeeze(1)
        new_tok = apply(
            ob["hist_img"], act_ang, t, ob["pano_img"], ob["pano_ang"],
            deterministic, method=HAMT.encode_history,
            rngs={"dropout": k_hist},
        )
        b = hist_cache.shape[0]
        t_vec = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (b,))
        hist_cache = hist_cache.at[jnp.arange(b), t_vec + 1].set(
            new_tok.astype(hist_cache.dtype)
        )
        hist_len = hist_len + live.astype(jnp.int32)
        return action, logits, obj_logits, value, hist_cache, hist_len

    return core


def build_slot_reset(model: HAMT):
    """Reset selected history-cache slots to a fresh episode state
    (continuation-packed eval: a finished slot takes the next item)."""

    @partial(jax.jit, donate_argnames=("hist_cache",))
    def slot_reset(params, hist_cache, hist_len, reset_mask, rng):
        b, h, d = hist_cache.shape
        hist0 = model.apply({"params": params}, b, True,
                            method=HAMT.init_history,
                            rngs={"dropout": rng})
        fresh = jnp.zeros((b, h, d), hist_cache.dtype).at[:, 0].set(hist0)
        hist_cache = jnp.where(reset_mask[:, None, None], fresh, hist_cache)
        hist_len = jnp.where(reset_mask, 1, hist_len)
        return hist_cache, hist_len

    return slot_reset


def build_text_encoder(model: HAMT):
    @partial(jax.jit, static_argnames=("deterministic",))
    def encode_text(params, txt_ids, txt_mask, rng, deterministic: bool = True):
        return model.apply({"params": params}, txt_ids, txt_mask, deterministic,
                           method=HAMT.encode_text, rngs={"dropout": rng})

    return encode_text


def build_init_history(model: HAMT):
    @partial(jax.jit, static_argnames=("batch_size", "deterministic"))
    def init_history(params, rng, batch_size: int, deterministic: bool = True):
        return model.apply({"params": params}, batch_size, deterministic,
                           method=HAMT.init_history, rngs={"dropout": rng})

    return init_history


# ----------------------------------------------------------------------
def _device_angle_feats(heading, elevation, a_size: int):
    """jnp mirror of data.angle.angle_features (fp32 trig)."""
    heading = heading.astype(jnp.float32)
    elevation = elevation.astype(jnp.float32)
    base = jnp.stack([jnp.sin(heading), jnp.cos(heading),
                      jnp.sin(elevation), jnp.cos(elevation)], axis=-1)
    reps = a_size // 4
    if reps > 1:
        base = jnp.tile(base, (1,) * (base.ndim - 1) + (reps,))
    return base


def _dp_extend(dp, cost):
    """One DTW row extension, vectorized over the batch.

    dp (B, R+1): previous DP row; cost (B, R): dist(new_node, ref_j).
    Mirrors eval.metrics.IncrementalNDTW._extend:
      cur[j] = cost[j-1] + min(prev[j], prev[j-1], cur[j-1]), cur[0]=inf.
    """
    b, r = cost.shape

    def jstep(cur_prev, x):
        prev_j, prev_jm1, cost_j = x
        cur_j = cost_j + jnp.minimum(jnp.minimum(prev_j, prev_jm1), cur_prev)
        return cur_j, cur_j

    xs = (jnp.moveaxis(dp[:, 1:], 0, 1),   # prev[j],   (R, B)
          jnp.moveaxis(dp[:, :-1], 0, 1),  # prev[j-1], (R, B)
          jnp.moveaxis(cost, 0, 1))        # cost[j-1], (R, B)
    _, rows = jax.lax.scan(jstep, jnp.full((b,), jnp.inf), xs)
    return jnp.concatenate([jnp.full((b, 1), jnp.inf),
                            jnp.moveaxis(rows, 0, 1)], axis=1)


def build_device_rollout(model: HAMT, critic: Critic, cfg: ModelConfig,
                         t_max: int, ob_type: str = "pano",
                         error_margin: float = 3.0, task: str = "r2r"):
    """The WHOLE RL sampling rollout as one jitted device program.

    The reference's rollout makes ``t_max`` Python/simulator/GPU round
    trips per iteration (agent_cmt.py:248-529). With the feature table
    and the nav tables (data/nav_graph.py:build_nav_tables) resident in
    HBM, the graph transition is a gather, the nDTW fidelity reward is
    an O(R) DP row extension, and the distance reward is a table
    column read — so the sampling loop becomes a ``lax.scan`` with ZERO
    host involvement. The host ships only start poses and per-item cost
    slabs.

    ``task`` selects the reward/termination shaping, mirroring the host
    agents exactly (parity-tested):
    - 'r2r': HAMTAgent._step_rewards (agent_cmt.py:407-445); inputs
      ``ref_cost (B, N_scan, R)`` + ``ref_len (B,)``.
    - 'cvdn': CVDNAgent (cvdn/agent.py:173-203) — no nDTW, exact-goal
      stop bonus, signed unit move reward; input ``goal_cost (B, N)``
      (min distance to any end pano).
    - 'r2r_back': R2RBackAgent (agent_r2rback.py:233-277) — two-phase
      distance (midstop then goal), failed (mid)stop force-ends the
      episode; inputs ``ref_cost``/``ref_len`` + ``mid_cost (B, N)`` +
      ``goal_cost (B, N)``.
    - 'reverie': ReverieAgent (reverie/agent.py:251-304 action space +
      base R2R shaping) — the policy core is plan_ref with per-node
      object-table gathers, the action space appends the obj-stop slot,
      and the multi-goal distance comes from ``goal_cost (B, N)`` (min
      over object-visible viewpoints, reverie/env.py:206-214); requires
      the ``obj_tables`` argument. nDTW extends only on candidate moves
      (host parity: env_actions = a_t < stop_slot, reverie agent).

    Dropout/sampling keys mirror the host loop (step_key(base, t), same
    split order via the shared policy core), so logits and trajectories
    are bit-comparable with the host rollout.

    Returns device_rollout(params, cparams, txt_ids, txt_mask, rng,
        feat_table, nav (dict), start_node (B,) GLOBAL, start_view (B,),
        offs (B,), task_inputs (dict, see above), deterministic)
      -> (ep dict for scan replay, extras dict)
    """
    expand_obs = make_expand_obs(36, cfg.angle_feat_size, ob_type)
    if task == "reverie":
        core = _make_ref_policy_core(model, critic, cfg)
        ang_tab = _obj_angle_table(cfg.angle_feat_size)
    else:
        core = _make_policy_core(model, critic, expand_obs)
    use_ndtw = task in ("r2r", "r2r_back", "reverie")

    def rollout_raw(params, cparams, txt_ids, txt_mask, rng,
                    feat_table, nav, start_node, start_view, offs,
                    task_inputs, obj_tables=None,
                    deterministic: bool = False,
                    compute_bootstrap: bool = False,
                    il=None, policy: str = "sample",
                    compute_rewards: bool = True):
        # ``il``: optional teacher-forced lanes merged INTO the same
        # scan (the merged 'sample' update): a dict of batch-major
        # (B_il, T) arrays node_idx / view_index / actions / step_mask
        # from a recorded teacher episode. txt_ids/txt_mask must then be
        # the concatenation [RL lanes | IL lanes]. The scan runs the
        # policy core once per step over B + B_il lanes — IL lanes force
        # the recorded action (mode='mixed'), take their pose from the
        # record instead of graph transitions, and contribute no reward;
        # their per-step logits come back in extras['il_logits'] for the
        # CE loss. One T-step scan instead of two.
        b = start_node.shape[0]
        b_il = 0 if il is None else il["actions"].shape[0]
        bt = b + b_il
        assert txt_ids.shape[0] == bt, (txt_ids.shape, b, b_il)
        stop = nav["nbr_global"].shape[1]  # slot layout: [C cands | STOP | pano]
        apply = partial(model.apply, {"params": params})

        txt_embeds = apply(txt_ids, txt_mask, deterministic,
                           method=HAMT.encode_text,
                           rngs={"dropout": jax.random.fold_in(rng, TXT_KEY_SALT)})
        hist0 = apply(bt, deterministic, method=HAMT.init_history,
                      rngs={"dropout": jax.random.fold_in(rng, HIST0_KEY_SALT)})
        hist_cache = jnp.zeros((bt, t_max + 1, cfg.hidden_size), hist0.dtype)
        hist_cache = hist_cache.at[:, 0].set(hist0)
        hist_len = jnp.ones((bt,), jnp.int32)

        bi = jnp.arange(b)

        if not compute_rewards:
            # greedy-eval mode (policy='argmax'): no reward shaping, no
            # cost slabs required (GT-less test splits) — only the
            # episode-ending rules. r2r_back keeps the EVAL two-phase
            # rule (variants.py:_update_ended with train_rl=False:
            # second stop ends, no failed-midstop force-end).
            rstate = ({"first_ended": jnp.zeros((b,), bool)}
                      if task == "r2r_back" else {})

            def reward_and_end(st, ended, live, stopped, extend, new_node):
                if task == "r2r_back":
                    new_ended = ended | (st["first_ended"] & stopped)
                    st = {"first_ended": st["first_ended"] | stopped}
                else:
                    new_ended = ended | stopped
                return jnp.zeros((b,), jnp.float32), st, new_ended

        elif use_ndtw:
            ref_cost = task_inputs["ref_cost"]
            rl = task_inputs["ref_len"].astype(jnp.int32)

            def ref_cost_at(node):  # (B, R) dist(node, ref_j)
                return ref_cost[bi, node - offs]

            def ndtw_val(dp):
                return jnp.exp(-dp[bi, rl]
                               / (error_margin * rl.astype(jnp.float32)))

        if compute_rewards:
            if task == "r2r":
                def goal_dist(node):  # dist to the last reference node
                    return ref_cost_at(node)[bi, rl - 1]
            else:
                goal_cost = task_inputs["goal_cost"]

                def goal_dist(node):
                    return goal_cost[bi, node - offs]
            if task == "r2r_back":
                mid_cost = task_inputs["mid_cost"]

                def mid_dist(node):
                    return mid_cost[bi, node - offs]

        def cand_tables(node, view):
            cg = nav["nbr_global"][node]  # (B, C)
            valid = cg >= 0
            cp = jnp.where(valid, nav["nbr_point"][node], -1)
            base_h = (view % 12).astype(jnp.float32) * (jnp.pi / 6.0)
            ang = _device_angle_feats(nav["nbr_head"][node] - base_h[:, None],
                                      nav["nbr_elev"][node],
                                      cfg.angle_feat_size)
            ang = jnp.where(valid[:, :, None], ang, 0.0)
            return cg, valid, cp, ang

        if compute_rewards:
            # task-specific reward state carried through the scan
            rstate = {}
            if use_ndtw:
                # initial nDTW DP row: closed column 0, then the start
                # node
                dp0 = jnp.full((b, ref_cost.shape[2] + 1),
                               jnp.inf).at[:, 0].set(0.0)
                dp0 = _dp_extend(dp0, ref_cost_at(start_node))
                rstate["dp"] = dp0
                rstate["last_ndtw"] = ndtw_val(dp0)
            if task == "r2r_back":
                # phase-1 goal is the midstop (agent_r2rback.py:234-237)
                rstate["last_dist"] = mid_dist(start_node)
                rstate["first_ended"] = jnp.zeros((b,), bool)
                rstate["force_ended"] = jnp.zeros((b,), bool)
            else:
                rstate["last_dist"] = goal_dist(start_node)

            def reward_and_end(st, ended, live, stopped, extend, new_node):
                # ``stopped``: the task's stop action was taken;
                # ``extend``: the nDTW prediction path grows this step
                # (host parity: env_actions >= 0 — live and not STOP for
                # r2r/cvdn/r2r_back, candidate moves only for reverie)
                st_new = dict(st)
                if use_ndtw:
                    dp_new = _dp_extend(st["dp"], ref_cost_at(new_node))
                    dp = jnp.where(extend[:, None], dp_new, st["dp"])
                    cur_ndtw = ndtw_val(dp)
                    nr = cur_ndtw - st["last_ndtw"]
                    st_new.update(dp=dp, last_ndtw=cur_ndtw)
                if task == "r2r_back":
                    # phase dist uses PRE-update first_ended (rewards are
                    # computed before _update_ended on the host)
                    dist = jnp.where(st["first_ended"], goal_dist(new_node),
                                     mid_dist(new_node))
                else:
                    dist = goal_dist(new_node)
                delta = -(dist - st["last_dist"])

                if task == "cvdn":
                    # cvdn/agent.py:173-203: exact-goal stop bonus,
                    # signed unit move reward, no miss penalty, no nDTW
                    stop_r = jnp.where(dist == 0.0, 2.0, -2.0)
                    move_r = jnp.where(delta > 0.0, 1.0,
                                       jnp.where(delta < 0.0, -1.0, 0.0))
                else:
                    stop_r = jnp.where(dist < error_margin,
                                       2.0 + cur_ndtw * 2.0, -2.0)
                    move_r = jnp.where(delta > 0.0, 1.0 + nr, -1.0 + nr)
                    miss = ((st["last_dist"] <= 1.0)
                            & (dist - st["last_dist"] > 0.0))
                    move_r = move_r - jnp.where(
                        miss, (1.0 - st["last_dist"]) * 2.0, 0.0)
                reward = jnp.where(stopped, stop_r, move_r)
                reward = jnp.where(live, reward, 0.0).astype(jnp.float32)

                if task == "r2r_back":
                    # failing the (mid)stop force-ends the episode in RL
                    # (agent_r2rback.py:254-256); after the midstop the
                    # tracked distance switches to the final goal
                    # (:270-273)
                    force = st["force_ended"] | (live & stopped
                                                 & (dist >= error_margin))
                    st_new["last_dist"] = jnp.where(
                        live & stopped & ~st["first_ended"],
                        goal_dist(new_node), dist)
                    st_new["force_ended"] = force
                    st_new["first_ended"] = st["first_ended"] | stopped
                    new_ended = ended | (st["first_ended"] & stopped) | force
                else:
                    st_new["last_dist"] = dist
                    new_ended = ended | stopped
                return reward, st_new, new_ended

        n_ob = stop + 1 + 36
        # reverie appends the obj-stop slot to the action space
        stop_action = n_ob if task == "reverie" else stop
        forbid = jnp.zeros((bt, n_ob + (1 if task == "reverie" else 0)), bool)
        zeros_i = jnp.zeros((b,), jnp.int32)

        def body(carry, x):
            ended, node, view, hist_cache, hist_len, rstate = carry
            live = ~ended
            if il is None:
                node_all, view_all, live_all = node, view, live
                given, mode = zeros_i, policy
            else:
                # IL lanes take their pose from the recorded episode
                # (no transitions) and force the recorded action
                node_all = jnp.concatenate([node, x["il_node"]])
                view_all = jnp.concatenate([view, x["il_view"]])
                live_all = jnp.concatenate([live, x["il_live"]])
                given = jnp.concatenate(
                    [jnp.full((b,), -1, jnp.int32), x["il_act"]])
                mode = "mixed"
            cg, valid, cand_point, cand_ang = cand_tables(node_all, view_all)
            pano = feat_table[node_all]
            il_obj_logits = None
            if task == "reverie":
                om = obj_tables["mask"][node_all]
                ov = obj_tables["view"][node_all]
                obj_angs = jnp.where(om[..., None],
                                     ang_tab[view_all[:, None], ov], 0.0)
                action, logits, obj_logits, value, hist_cache, hist_len = core(
                    params, cparams, txt_embeds, txt_mask, hist_cache,
                    hist_len, x["t"], pano, view_all, cand_point, cand_ang,
                    obj_tables["fts"][node_all], obj_angs,
                    obj_tables["pos"][node_all], om,
                    live_all, forbid, given, x["key"], mode, deterministic)
                il_obj_logits = obj_logits[b:]
            else:
                action, logits, value, hist_cache, hist_len = core(
                    params, cparams, txt_embeds, txt_mask, hist_cache,
                    hist_len, x["t"], pano, view_all, cand_point, cand_ang,
                    live_all, forbid, given, x["key"], mode, deterministic)
            il_logits = logits[b:]
            action, logits, value = action[:b], logits[:b], value[:b]
            cg, valid = cg[:b], valid[:b]
            cand_point, cand_ang = cand_point[:b], cand_ang[:b]

            rec_action = jnp.where(live, action, stop_action)
            slot = jnp.clip(action, 0, stop - 1)
            tgt = jnp.take_along_axis(cg, slot[:, None], 1)[:, 0]
            tgt_ok = jnp.take_along_axis(valid, slot[:, None], 1)[:, 0]
            moved = live & (action < stop) & tgt_ok
            new_node = jnp.where(moved, tgt, node)
            new_view = jnp.where(
                moved, jnp.take_along_axis(cand_point, slot[:, None], 1)[:, 0],
                view)

            stopped = action == stop_action
            extend = (live & (action < stop) if task == "reverie"
                      else live & ~stopped)
            reward, rstate, new_ended = reward_and_end(
                rstate, ended, live, stopped, extend, new_node)

            carry = (new_ended, new_node, new_view, hist_cache, hist_len,
                     rstate)
            ys = (rec_action, logits, value, reward, live,
                  node, view, cand_point, cand_ang)
            if il is not None:
                ys = ys + (il_logits,)
                if il_obj_logits is not None:
                    ys = ys + (il_obj_logits,)
            elif task == "reverie" and policy == "argmax":
                # greedy eval records the grounded-object prediction per
                # step; the host reads it at each lane's stop step
                ys = ys + (jnp.argmax(obj_logits, axis=-1)[:b],)
            return carry, ys

        xs = {
            "t": jnp.arange(t_max, dtype=jnp.int32),
            "key": jax.vmap(lambda t: step_key(rng, t))(jnp.arange(t_max)),
        }
        if il is not None:
            xs.update(
                il_node=jnp.moveaxis(il["node_idx"], 0, 1).astype(jnp.int32),
                il_view=jnp.moveaxis(il["view_index"], 0, 1),
                il_act=jnp.moveaxis(il["actions"], 0, 1).astype(jnp.int32),
                il_live=jnp.moveaxis(il["step_mask"], 0, 1),
            )
        carry0 = (jnp.zeros((b,), bool), start_node, start_view,
                  hist_cache, hist_len, rstate)
        # remat per step so the fused-update path (gradients THROUGH
        # this scan) has the same memory envelope as the replay scan;
        # free for the inference-only call (no backward is built)
        scan_body = remat_scan_body(body, cfg)
        carry, ys = jax.lax.scan(scan_body, carry0, xs)
        ended, node, view = carry[0], carry[1], carry[2]
        (actions, logits, values, rewards, lives,
         nodes, views, cpoints, cangs) = ys[:9]

        _, _, final_cp, final_ca = cand_tables(node, view)
        ep = {
            "txt_ids": txt_ids, "txt_mask": txt_mask,
            "node_idx": jnp.moveaxis(nodes, 0, 1).astype(jnp.int32),
            "view_index": jnp.moveaxis(views, 0, 1),
            "cand_point": jnp.moveaxis(cpoints, 0, 1),
            "cand_ang": jnp.moveaxis(cangs, 0, 1),
            "actions": jnp.moveaxis(actions, 0, 1),
            "step_mask": jnp.moveaxis(lives, 0, 1),
            "final_node_idx": node.astype(jnp.int32),
            "final_view_index": view,
            "final_cand_point": final_cp,
            "final_cand_ang": final_ca,
        }
        extras = {
            "rewards": jax.lax.stop_gradient(rewards),  # (T, B)
            "masks": lives.astype(jnp.float32),         # (T, B)
            "bootstrap_mask": ~ended,                   # (B,)
            "rollout_logits": logits,                   # (T, B, N)
            "values": values,                           # (T, B)
        }
        if il is not None:
            extras["il_logits"] = ys[9]                 # (T, B_il, N)
            if task == "reverie":
                extras["il_obj_logits"] = ys[10]        # (T, B_il, O)
        elif task == "reverie" and policy == "argmax":
            extras["obj_pred"] = ys[9]                  # (T, B) int32

        if compute_bootstrap:
            # final-obs bootstrap value (episode_forward's final branch;
            # agent_cmt.py:481-484) so the fused update needs no replay
            k_plan, k_critic = jax.random.split(
                jax.random.fold_in(rng, FINAL_KEY_SALT))
            fob = expand_obs(feat_table[node], view, final_cp, final_ca)
            h_max = hist_cache.shape[1]
            # RL lanes only (merged IL lanes need no bootstrap); under
            # no_lang_ca the text states are (X+1, B, L, D) — batch on
            # axis 1
            hist_cache_f, hist_len_f = carry[3][:b], carry[4][:b]
            txt_embeds = (txt_embeds[:, :b] if txt_embeds.ndim == 4
                          else txt_embeds[:b])
            txt_mask = txt_mask[:b]
            if task == "reverie":
                fom = obj_tables["mask"][node]
                fov = obj_tables["view"][node]
                fangs = jnp.where(fom[..., None],
                                  ang_tab[view[:, None], fov], 0.0)
                _, _, last_state = apply(
                    txt_embeds, txt_mask, hist_cache_f,
                    _hist_mask(hist_len_f, h_max),
                    fob["ob_img"], fob["ob_ang"], fob["ob_nav"],
                    fob["ob_mask"], obj_tables["fts"][node], fangs,
                    obj_tables["pos"][node], fom, deterministic,
                    method=HAMT.plan_ref, rngs={"dropout": k_plan},
                )
            else:
                _, last_state = apply(
                    txt_embeds, txt_mask, hist_cache_f,
                    _hist_mask(hist_len_f, h_max),
                    fob["ob_img"], fob["ob_ang"], fob["ob_nav"],
                    fob["ob_mask"], deterministic,
                    method=HAMT.plan, rngs={"dropout": k_plan},
                )
            last_value = critic.apply({"params": cparams}, last_state,
                                      deterministic,
                                      rngs={"dropout": k_critic})
            extras["last_value"] = jax.lax.stop_gradient(last_value)

        return ep, extras

    device_rollout = jax.jit(
        rollout_raw,
        static_argnames=("deterministic", "compute_bootstrap", "policy",
                         "compute_rewards"))
    device_rollout.raw = rollout_raw
    return device_rollout
