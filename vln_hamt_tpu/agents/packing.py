"""Packed imitation-learning episode batches.

The IL episode scan runs a STATIC ``max_action_len`` steps so one
compiled program serves every batch (CLAUDE.md shape invariant), but
real R2R teacher paths average ~5 live steps of 15 — two thirds of the
scan's transformer sweeps land on padding. The reference's host loop
simply breaks early (``agent_cmt.py:308`` + the all-ended break), which
a fixed-shape device scan cannot do without recompiling.

The TPU-native answer is sequence packing (the same idea as the packed
evaluator, ``agents/agent.py:eval_split_packed``, applied to training):
several episodes ride one scan SLOT back to back, each cell of the
(slots, T) grid tagged with its episode id, local step and episode-
start flag, and the device scan resets the per-slot history cache at
start cells (rollout.py:build_packed_il_forward). The per-episode
estimator is unchanged — the IL loss is the same summed CE over exactly
the same (episode, step) cells, normalized by the episode count — so a
packed update is gradient-equivalent to the unpacked updates over the
same episodes (tests/test_packed_il.py pins this).

Feature-table transport only: cells carry int32 node rows; packing
never touches features on the host (the same reason the table exists).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..env.observation import IGNORE_ID


class PackedILStream:
    """Pulls teacher episodes from the env and re-packs them densely.

    ``next_pack()`` returns one host-side pack dict (see schema below).
    Episodes are sliced out of the env's recorded ``EpisodeBatch``es and
    placed best-fit (largest remaining slot first) until either no
    queued episode fits or ``text_cap`` episodes are placed; leftovers
    stay queued for the next pack, so every drawn episode is trained on
    exactly once per draw (the minibatch stream keeps its shuffle/epoch
    semantics, only the grouping changes).

    Pack schema (numpy; S = slots, T = max_action_len, E = text_cap):
      txt_ids (E, L) int32 / txt_mask (E, L) bool — one row per packed
        episode (padding rows keep one live token for mask sanity);
      node_idx (S, T) int32 — global feature-table rows;
      view_index (S, T), cand_point (S, T, C), cand_ang (S, T, C, A);
      actions / teacher (S, T) int32 (teacher = IGNORE_ID on dead cells,
        so the packed CE sums exactly the live (episode, step) cells);
      live / is_start (S, T) bool, ep_id / local_t (S, T) int32;
      n_episodes () float32 — the loss normalizer.
    """

    #: per-step episode fields packed into the (S, T) grid beyond the
    #: base schema: {name: (fill_value, dtype)} (subclass hook — the
    #: REVERIE stream adds the grounded-object targets)
    extra_step_fields: Dict[str, tuple] = {}

    def __init__(self, env, text_cap: Optional[int] = None,
                 max_refills_per_pack: int = 8):
        assert env.feat_offsets is not None, (
            "packed IL requires feature-table transport "
            "(agent.enable_feature_table)")
        self.env = env
        self.slots = env.batch_size
        self.t_pack = env.max_action_len
        self.spec = env.spec
        if text_cap is None:
            # ~4 cells/episode is a conservative R2R-scale lower bound on
            # mean live length; more rows only pad the text encode
            text_cap = max(self.slots + 1,
                           (self.slots * self.t_pack) // 4)
        self.text_cap = int(text_cap)
        self.max_refills = max_refills_per_pack
        self._queue: List[Dict[str, np.ndarray]] = []
        #: total episodes handed out in packs (throughput accounting)
        self.episodes_consumed = 0

    # ------------------------------------------------------------ intake
    def _draw(self) -> List[Dict[str, np.ndarray]]:
        """One env draw -> per-episode dicts, sliced to live length.
        Subclass hook: the REVERIE stream replaces this with the
        dual-target teacher loop."""
        ep = self.env.teacher_episode()
        assert ep.node_idx is not None, (
            "packed IL env must be in feature-table (node index) mode")
        lens = ep.step_mask.sum(axis=1).astype(np.int64)
        out = []
        for i in range(ep.actions.shape[0]):
            l = int(lens[i])
            if l == 0:  # cannot happen (step 0 is always live); guard
                continue
            out.append(dict(
                txt_ids=np.asarray(ep.txt_ids[i]),
                txt_mask=np.asarray(ep.txt_mask[i]),
                node_idx=np.asarray(ep.node_idx[i, :l]),
                view_index=np.asarray(ep.view_index[i, :l]),
                cand_point=np.asarray(ep.cand_point[i, :l]),
                cand_ang=np.asarray(ep.cand_ang[i, :l]),
                actions=np.asarray(ep.actions[i, :l]),
                teacher=np.asarray(ep.teacher[i, :l]),
            ))
        return out

    def _refill(self) -> None:
        self._queue.extend(self._draw())

    # ------------------------------------------------------------ output
    def next_pack(self) -> Dict[str, np.ndarray]:
        s, t, spec = self.slots, self.t_pack, self.spec
        c, a = spec.max_candidates, spec.angle_feat_size
        l_txt = self.env.max_instr_len

        pack = dict(
            txt_ids=np.zeros((self.text_cap, l_txt), np.int32),
            txt_mask=np.zeros((self.text_cap, l_txt), bool),
            node_idx=np.zeros((s, t), np.int32),
            view_index=np.zeros((s, t), np.int32),
            cand_point=np.full((s, t, c), -1, np.int32),
            cand_ang=np.zeros((s, t, c, a), np.float32),
            actions=np.full((s, t), spec.stop_slot, np.int32),
            teacher=np.full((s, t), IGNORE_ID, np.int32),
            live=np.zeros((s, t), bool),
            is_start=np.zeros((s, t), bool),
            ep_id=np.zeros((s, t), np.int32),
            local_t=np.zeros((s, t), np.int32),
        )
        for k, (fill, dtype) in self.extra_step_fields.items():
            pack[k] = np.full((s, t), fill, dtype)
        # texts of padding rows keep one live token: an all-masked row
        # would softmax over a uniform -10000 field (finite but silly)
        pack["txt_mask"][:, 0] = True

        remaining = np.full((s,), t, np.int64)
        n_placed = 0
        refills = 0
        while n_placed < self.text_cap:
            slot = int(np.argmax(remaining))
            room = int(remaining[slot])
            if room <= 0:
                break
            j = next((k for k, e in enumerate(self._queue)
                      if len(e["actions"]) <= room), None)
            if j is None:
                if refills >= self.max_refills:
                    break
                self._refill()
                refills += 1
                continue
            e = self._queue.pop(j)
            l = len(e["actions"])
            t0 = t - room
            sl = np.s_[slot, t0:t0 + l]
            pack["node_idx"][sl] = e["node_idx"]
            pack["view_index"][sl] = e["view_index"]
            pack["cand_point"][sl] = e["cand_point"]
            pack["cand_ang"][sl] = e["cand_ang"]
            pack["actions"][sl] = e["actions"]
            pack["teacher"][sl] = e["teacher"]
            for k in self.extra_step_fields:
                pack[k][sl] = e[k]
            pack["live"][sl] = True
            pack["is_start"][slot, t0] = True
            pack["ep_id"][sl] = n_placed
            pack["local_t"][sl] = np.arange(l)
            ids = e["txt_ids"][:l_txt]
            pack["txt_ids"][n_placed, : len(ids)] = ids
            pack["txt_mask"][n_placed] = False
            pack["txt_mask"][n_placed, : len(ids)] = e["txt_mask"][:l_txt]
            remaining[slot] -= l
            n_placed += 1

        assert n_placed > 0, "packing produced an empty pack"
        pack["n_episodes"] = np.float32(n_placed)
        self.episodes_consumed += n_placed
        return pack


class ReveriePackedILStream(PackedILStream):
    """Packed stream of REVERIE dual-target teacher episodes.

    Same packing as the base class plus one extra per-cell field:
    ``ref_teacher`` — the GT object's index among the viewpoint's
    candidate objects (reverie/agent.py:271-275), IGNORE_ID off the
    goal viewpoint — so the packed update can apply the dual act+obj CE
    over exactly the live cells. Episodes are drawn with the agent's
    teacher loop (``ReverieAgent._ref_teacher_targets``: stop maps to
    the appended obj-stop slot) instead of ``env.teacher_episode``.
    Object features stay in the device object tables; cells carry only
    node rows (the tables are node-aligned with the pano table).
    """

    extra_step_fields = {"ref_teacher": (IGNORE_ID, np.int32)}

    def __init__(self, env, agent, text_cap: Optional[int] = None,
                 max_refills_per_pack: int = 8):
        super().__init__(env, text_cap=text_cap,
                         max_refills_per_pack=max_refills_per_pack)
        self.agent = agent

    def _draw(self) -> List[Dict[str, np.ndarray]]:
        env, agent = self.env, self.agent
        obs = env.reset()
        feat_offs = np.array([env.feat_offsets[it["scan"]]
                              for it in env.batch], np.int64)
        b = obs.batch_size
        t_max = env.max_action_len
        stop = agent.ref_stop
        txt_ids, txt_mask = env.txt_batch()

        cols: Dict[str, List[np.ndarray]] = {
            k: [] for k in ("node_idx", "view_index", "cand_point",
                            "cand_ang", "actions", "teacher",
                            "ref_teacher")}
        live_rec: List[np.ndarray] = []
        ended = np.zeros((b,), bool)
        for t in range(t_max):
            teacher_t, ref_t = agent._ref_teacher_targets(obs)
            live = ~ended
            live_rec.append(live.copy())
            cols["node_idx"].append((feat_offs + obs.node).astype(np.int32))
            cols["view_index"].append(np.asarray(obs.view_index))
            cols["cand_point"].append(np.asarray(obs.cand_point))
            cols["cand_ang"].append(np.asarray(obs.cand_ang))
            cols["actions"].append(
                np.where(live, teacher_t, stop).astype(np.int32))
            cols["teacher"].append(
                np.where(live, teacher_t, IGNORE_ID).astype(np.int32))
            cols["ref_teacher"].append(
                np.where(live, ref_t, IGNORE_ID).astype(np.int32))
            env_actions = np.where(live & (teacher_t < agent.stop_slot),
                                   teacher_t, -1)
            ended = ended | (teacher_t == stop)
            if t + 1 < t_max:
                obs = env.step(env_actions, obs)
                if ended.all():
                    break
        stacked = {k: np.stack(v, axis=1) for k, v in cols.items()}
        lens = np.stack(live_rec, axis=1).sum(axis=1).astype(np.int64)

        out = []
        for i in range(b):
            l = int(lens[i])
            if l == 0:  # step 0 is always live; guard
                continue
            ep = {k: stacked[k][i, :l].copy() for k in stacked}
            ep["txt_ids"] = np.asarray(txt_ids[i])
            ep["txt_mask"] = np.asarray(txt_mask[i])
            out.append(ep)
        return out
