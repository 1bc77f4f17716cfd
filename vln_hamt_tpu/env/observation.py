"""Fixed-shape observation batches.

The TPU-critical redesign of the reference's per-batch variable padding
(``agent_cmt.py:104-151`` pads candidates to the *batch max* each step,
which would retrigger XLA compilation). Here every observation has one
static layout:

    slot 0 .. C-1 : candidate slots (padded, masked)       nav_type 1
    slot C        : STOP                                   nav_type 2
    slot C+1 .. C+36 : the full 36-view panorama context   nav_type 0

Views already represented by a candidate are masked out of the panorama
region, matching the reference's ``feature[~cand_pointids]`` exclusion.
The STOP action is always slot C — constant across the batch, unlike the
reference's per-sample ``len(candidate)`` index — so action semantics
are uniform tensors.

Candidate geometry is closed-form from the NavGraph tables; features are
gathered from the panorama feature matrix at each candidate's
representative view (``pointId``), with angle features relative to the
agent's current base heading (parity: ``env.py:182-252``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..data.angle import all_point_angle_feature, angle_features, view_heading
from ..data.nav_graph import NavGraph
from .sim import GraphSimulator


@dataclasses.dataclass(frozen=True)
class ObsSpec:
    views: int = 36
    max_candidates: int = 14
    image_feat_size: int = 768
    angle_feat_size: int = 4

    @property
    def num_ob_tokens(self) -> int:
        return self.max_candidates + 1 + self.views

    @property
    def stop_slot(self) -> int:
        return self.max_candidates


@dataclasses.dataclass
class ObsBatch:
    """One step's observations for the whole batch (numpy, device-ready)."""

    # model inputs
    ob_img: np.ndarray  # (B, N, D) float32
    ob_ang: np.ndarray  # (B, N, A) float32
    ob_nav: np.ndarray  # (B, N) int32 {0 context, 1 candidate, 2 stop}
    ob_mask: np.ndarray  # (B, N) bool attendable tokens
    hist_img: np.ndarray  # (B, D) current-view feature
    hist_pano_img: np.ndarray  # (B, V, D)
    hist_pano_ang: np.ndarray  # (B, V, A)
    # host bookkeeping
    cand_node: np.ndarray  # (B, C) int32, -1 pad
    cand_view: np.ndarray  # (B, C) int32 representative view ids
    teacher: np.ndarray  # (B,) int32 action slot (stop_slot for STOP)
    node: np.ndarray  # (B,) int32 current node
    view_index: np.ndarray  # (B,) int32
    dist_to_goal: np.ndarray  # (B,) float32
    # task-variant extras (host-side), populated by subclass envs
    dist_to_mid: Optional[np.ndarray] = None  # R2R-Back (B,)
    obj_fts: Optional[np.ndarray] = None  # REVERIE (B, K, Do)
    obj_angs: Optional[np.ndarray] = None  # (B, K, A)
    obj_pos: Optional[np.ndarray] = None  # (B, K, 5)
    obj_mask: Optional[np.ndarray] = None  # (B, K)
    obj_ids: Optional[list] = None  # per-sample object id strings

    @property
    def batch_size(self) -> int:
        return self.ob_img.shape[0]


@dataclasses.dataclass
class EpisodeBatch:
    """A full teacher-forced (or replayed) episode, time-stacked.

    This is what enables training as ONE jitted `lax.scan` over time
    instead of the reference's per-step Python/GPU interleaving
    (SURVEY §3.1): under teacher forcing the trajectory is the ground
    truth path, so all observations are known upfront.
    """

    txt_ids: np.ndarray  # (B, L) int32
    txt_mask: np.ndarray  # (B, L) bool
    ob_img: np.ndarray  # (B, T, N, D)
    ob_ang: np.ndarray  # (B, T, N, A)
    ob_nav: np.ndarray  # (B, T, N)
    ob_mask: np.ndarray  # (B, T, N)
    hist_img: np.ndarray  # (B, T, D)
    hist_pano_img: np.ndarray  # (B, T, V, D)
    hist_pano_ang: np.ndarray  # (B, T, V, A)
    actions: np.ndarray  # (B, T) int32 action slots taken (teacher for IL)
    step_mask: np.ndarray  # (B, T) bool valid (pre-stop) steps
    teacher: np.ndarray  # (B, T) int32 supervision (ignore_id when invalid)


_ANGLE_TABLE_CACHE: Dict[int, np.ndarray] = {}


def _angle_table(angle_feat_size: int) -> np.ndarray:
    tab = _ANGLE_TABLE_CACHE.get(angle_feat_size)
    if tab is None:
        tab = all_point_angle_feature(angle_feat_size)  # (36, 36, A)
        _ANGLE_TABLE_CACHE[angle_feat_size] = tab
    return tab


def make_obs_slot(
    spec: ObsSpec,
    graph: NavGraph,
    features: np.ndarray,  # (36, D)
    node: int,
    view_index: int,
    goal: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Assemble one sample's fixed-shape observation arrays."""
    c = spec.max_candidates
    n = spec.num_ob_tokens
    d, a = spec.image_feat_size, spec.angle_feat_size

    ob_img = np.zeros((n, d), dtype=np.float32)
    ob_ang = np.zeros((n, a), dtype=np.float32)
    ob_nav = np.zeros((n,), dtype=np.int32)
    ob_mask = np.zeros((n,), dtype=bool)
    cand_node = np.full((c,), -1, dtype=np.int32)
    cand_view = np.full((c,), -1, dtype=np.int32)

    nbrs = graph.nbr_index[node]
    valid = nbrs >= 0
    deg = int(valid.sum())
    if deg > c:
        raise ValueError(
            f"scan {graph.scan} node {node} has degree {deg} > max_candidates {c}"
        )
    base_heading = float(view_heading(view_index))

    point_ids = graph.nbr_point_id[node][valid]
    cand_node[:deg] = nbrs[valid]
    cand_view[:deg] = point_ids
    ob_img[:deg] = features[point_ids]
    ob_ang[:deg] = angle_features(
        graph.nbr_heading[node][valid] - base_heading,
        graph.nbr_elevation[node][valid],
        a,
    )
    ob_nav[:deg] = 1
    ob_mask[:deg] = True

    # STOP slot: zero features (agent_cmt.py:119-121), nav type 2.
    ob_nav[c] = 2
    ob_mask[c] = True

    # panorama context: all 36 views, minus those claimed by candidates.
    tab = _angle_table(a)
    ob_img[c + 1 :] = features
    ob_ang[c + 1 :] = tab[view_index]
    claimed = np.zeros((spec.views,), dtype=bool)
    claimed[point_ids] = True
    ob_mask[c + 1 :] = ~claimed

    out = {
        "ob_img": ob_img,
        "ob_ang": ob_ang,
        "ob_nav": ob_nav,
        "ob_mask": ob_mask,
        "cand_node": cand_node,
        "cand_view": cand_view,
        "hist_img": features[view_index],
        "hist_pano_img": features,
        "hist_pano_ang": tab[view_index],
    }
    if goal is not None:
        out["dist_to_goal"] = np.float32(graph.dist[node, goal])
    return out


IGNORE_ID = -100


def teacher_slot(cand_node: np.ndarray, stop_slot: int, teacher_node: int,
                 current_node: int) -> int:
    """Action slot of the teacher move (parity: agent_cmt.py:192-211).

    Returns ``IGNORE_ID`` when the fixed-step teacher node is neither a
    candidate nor the current node — which happens whenever the agent
    has wandered off the ground-truth schedule (RL sampling / eval). The
    reference never queries the teacher in that regime (``train_ml is
    None``); keeping it lenient here lets one obs assembly serve IL, RL
    and eval. On-path IL supervision asserts non-ignore downstream.
    """
    hits = np.nonzero(cand_node == teacher_node)[0]
    if len(hits):
        return int(hits[0])
    if teacher_node == current_node:
        return stop_slot
    return IGNORE_ID


def make_obs_batch(
    spec: ObsSpec,
    sim: GraphSimulator,
    features: Sequence[np.ndarray],  # per-slot (36, D) pano features
    goals: Sequence[int],
    teacher_nodes: Sequence[int],
) -> ObsBatch:
    b = len(features)
    slots = []
    for i in range(b):
        st = sim.get_state(i)
        slots.append(
            make_obs_slot(spec, sim.graph(i), features[i], st.node, st.view_index,
                          goal=goals[i])
        )
    stack = {k: np.stack([s[k] for s in slots]) for k in slots[0]}
    teacher = np.array(
        [
            teacher_slot(slots[i]["cand_node"], spec.stop_slot, teacher_nodes[i],
                         int(sim.node[i]))
            for i in range(b)
        ],
        dtype=np.int32,
    )
    return ObsBatch(
        ob_img=stack["ob_img"],
        ob_ang=stack["ob_ang"],
        ob_nav=stack["ob_nav"],
        ob_mask=stack["ob_mask"],
        hist_img=stack["hist_img"],
        hist_pano_img=stack["hist_pano_img"],
        hist_pano_ang=stack["hist_pano_ang"],
        cand_node=stack["cand_node"],
        cand_view=stack["cand_view"],
        teacher=teacher,
        node=sim.node[:b].copy(),
        view_index=sim.view_index[:b].copy(),
        dist_to_goal=stack["dist_to_goal"],
    )
