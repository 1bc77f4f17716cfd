"""Task-variant agents: R2R-Back and CVDN.

Both share the base interactive rollout / replay machinery; only the
reward shaping and episode-termination semantics differ, expressed via
the base class hooks.

Parity targets:
- ``Seq2SeqBackAgent`` (finetune_src/r2r/agent_r2rback.py): two-phase
  episodes — the first STOP marks the midstop and the episode continues
  back toward the start; reward distances switch goal at the midstop; a
  failed midstop (>= error margin) terminates the episode during RL.
- ``NavCMTAgent`` (finetune_src/cvdn/agent.py:173-203): reward without
  nDTW shaping, stop reward +2 only at exact goal panos, no
  miss-the-target penalty, zero reward for equidistant moves.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .agent import HAMTAgent


class R2RBackAgent(HAMTAgent):
    #: two-phase rewards are compiled into the device rollout scan
    #: (rollout.py task='r2r_back'); parity-tested vs the host hooks
    device_rollout_task = "r2r_back"

    def _device_rollout_inputs(self, env, obs) -> Dict[str, np.ndarray]:
        ins = super()._device_rollout_inputs(env, obs)
        ins["mid_cost"] = self._goal_cost_slab(
            env, lambda g, it: [g.index(it["midstop"])])
        ins["goal_cost"] = self._goal_cost_slab(
            env, lambda g, it: [g.index(it["path"][-1])])
        return ins

    def _episode_state_init(self, obs, graphs, traj) -> Dict[str, Any]:
        st = super()._episode_state_init(obs, graphs, traj)
        b = obs.batch_size
        st["first_ended"] = np.zeros((b,), bool)
        st["force_ended"] = np.zeros((b,), bool)
        # phase-1 goal is the midstop (agent_r2rback.py:234-237)
        assert obs.dist_to_mid is not None, "R2RBackAgent needs R2RBackNavEnv"
        st["last_dist"] = obs.dist_to_mid.copy()
        return st

    def _pre_env_step(self, t, a_t, live, ended, obs, ep_state, traj) -> None:
        """First STOP records the midstop (agent_r2rback.py:194-198)."""
        stop = self.stop_slot
        for i in range(len(a_t)):
            if live[i] and a_t[i] == stop and not ep_state["first_ended"][i]:
                g = self.env.sim.graph(i)
                traj[i]["midstop"] = g.node_ids[int(obs.node[i])]

    def _phase_dist(self, obs, ep_state) -> np.ndarray:
        return np.where(ep_state["first_ended"], obs.dist_to_goal,
                        obs.dist_to_mid).astype(np.float32)

    def _step_rewards(self, t, a_t, live, ended, obs, ep_state) -> np.ndarray:
        b = len(a_t)
        stop = self.stop_slot
        rewards = np.zeros((b,), np.float32)
        ndtw = ep_state["ndtw"]
        dist = self._phase_dist(obs, ep_state)
        cur_ndtw = np.array([ndtw.value(i) for i in range(b)], np.float32)
        last_dist, last_ndtw = ep_state["last_dist"], ep_state["last_ndtw"]
        for i in range(b):
            if not live[i]:
                continue
            if a_t[i] == stop:
                if dist[i] < 3.0:
                    rewards[i] = 2.0 + cur_ndtw[i] * 2.0
                else:
                    rewards[i] = -2.0
                    # failing the (mid)stop ends the episode in RL
                    # (agent_r2rback.py:254-256)
                    ep_state["force_ended"][i] = True
            else:
                delta = -(dist[i] - last_dist[i])
                nr = cur_ndtw[i] - last_ndtw[i]
                rewards[i] = (1.0 + nr) if delta > 0.0 else (-1.0 + nr)
                if last_dist[i] <= 1.0 and dist[i] - last_dist[i] > 0.0:
                    rewards[i] -= (1.0 - last_dist[i]) * 2.0
        # after the midstop, the tracked distance switches to the final
        # goal (agent_r2rback.py:270-273)
        new_last = dist.copy()
        for i in range(b):
            if live[i] and a_t[i] == stop and not ep_state["first_ended"][i]:
                new_last[i] = obs.dist_to_goal[i]
        ep_state["last_dist"] = new_last
        ep_state["last_ndtw"] = cur_ndtw
        return rewards

    # ------------------------------------ packed-eval per-slot phase
    def _packed_slot_init(self, env, i) -> Dict[str, Any]:
        return {"midstop": None}

    def _packed_slot_done(self, st, g, i, a_t_i, steps) -> bool:
        """Two-phase termination (agent_r2rback.py:194-198,275-277): the
        first STOP records the midstop and the episode continues back
        toward the start; the second STOP (or the step budget) ends."""
        env = g.env
        stop = self.stop_slot
        if a_t_i == stop and st["midstop"] is None:
            graph = env.sim.graph(i)
            st["midstop"] = graph.node_ids[int(env.sim.node[i])]
            return steps >= env.max_action_len
        return a_t_i == stop or steps >= env.max_action_len

    def _packed_slot_result(self, st, pred: dict) -> None:
        pred["midstop"] = st["midstop"]

    def _decode_device_extras(self, pred, env, i, node, view, actions,
                              mask, extras_np) -> None:
        """Device-scan eval: the FIRST live STOP is the midstop
        (agent_r2rback.py:194-198); None when the episode never
        stopped (matches the packed evaluator's slot result)."""
        stop = env.spec.max_candidates
        pred["midstop"] = None
        for t in range(actions.shape[1]):
            if mask[i, t] and actions[i, t] == stop:
                item = env.batch[i]
                g = env.graphs[item["scan"]]
                off = env.feat_offsets[item["scan"]]
                pred["midstop"] = g.node_ids[int(node[i, t]) - off]
                return

    def _update_ended(self, ended, a_t, ep_state, train_rl: bool) -> np.ndarray:
        """agent_r2rback.py:275-277: second stop ends; first stop only
        flips first_ended (plus RL's failed-midstop forced end)."""
        stop = self.stop_slot
        stopped = a_t == stop
        new_ended = ended | (ep_state["first_ended"] & stopped)
        if train_rl:
            new_ended = new_ended | ep_state["force_ended"]
        ep_state["first_ended"] = ep_state["first_ended"] | stopped
        return new_ended

class CVDNAgent(HAMTAgent):
    #: multi-goal reward compiled into the device rollout scan
    #: (rollout.py task='cvdn'); parity-tested vs the host hooks
    device_rollout_task = "cvdn"

    def _device_rollout_inputs(self, env, obs) -> Dict[str, np.ndarray]:
        # min distance to any end pano per node (cvdn/env.py:80-87;
        # items without end_panos evaluate as always-at-goal, matching
        # CVDNNavEnv._observe)
        b = obs.batch_size
        slab = np.full((b, self._n_scan_max), np.inf, np.float32)
        for i, item in enumerate(env.batch):
            g = env.graphs[item["scan"]]
            if item.get("end_panos"):
                ends = [g.index(v) for v in item["end_panos"]]
                slab[i, : g.num_nodes] = g.dist[:, ends].min(axis=1)
            else:
                slab[i, : g.num_nodes] = 0.0
        return {"goal_cost": slab}

    def _episode_state_init(self, obs, graphs, traj) -> Dict[str, Any]:
        return {"last_dist": obs.dist_to_goal.copy()}

    def _step_rewards(self, t, a_t, live, ended, obs, ep_state) -> np.ndarray:
        b = len(a_t)
        stop = self.stop_slot
        rewards = np.zeros((b,), np.float32)
        dist = obs.dist_to_goal
        last_dist = ep_state["last_dist"]
        for i in range(b):
            if not live[i]:
                continue
            if a_t[i] == stop:
                rewards[i] = 2.0 if dist[i] == 0.0 else -2.0
            else:
                delta = -(dist[i] - last_dist[i])
                rewards[i] = 1.0 if delta > 0 else (-1.0 if delta < 0 else 0.0)
        ep_state["last_dist"] = dist.copy()
        return rewards
