import numpy as np
import pytest

from vln_hamt_tpu.data.nav_graph import NavGraph
from vln_hamt_tpu.eval.metrics import (
    aggregate_metrics,
    cls_score,
    dtw_scores,
    eval_r2r_item,
)


def _line_graph(n=8, spacing=2.0):
    pos = np.zeros((n, 3))
    pos[:, 1] = np.arange(n) * spacing
    adj = np.zeros((n, n), bool)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = True
    return NavGraph("line", [f"v{i}" for i in range(n)], pos, adj)


# Golden DP reimplementation of the reference cal_dtw
# (finetune_src/r2r/eval_utils.py:74-94) for cross-checking.
def _ref_dtw(dist, prediction, reference, success=None, threshold=3.0):
    m = np.inf * np.ones((len(prediction) + 1, len(reference) + 1))
    m[0][0] = 0
    for i in range(1, len(prediction) + 1):
        for j in range(1, len(reference) + 1):
            best = min(m[i - 1][j], m[i][j - 1], m[i - 1][j - 1])
            m[i][j] = dist[prediction[i - 1], reference[j - 1]] + best
    dtw = m[len(prediction)][len(reference)]
    ndtw = np.exp(-dtw / (threshold * len(reference)))
    if success is None:
        success = float(dist[prediction[-1], reference[-1]] < threshold)
    return {"DTW": dtw, "nDTW": ndtw, "SDTW": success * ndtw}


def test_dtw_matches_reference_dp():
    g = _line_graph()
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = rng.integers(0, 8, rng.integers(2, 7)).tolist()
        r = rng.integers(0, 8, rng.integers(2, 7)).tolist()
        got = dtw_scores(g.dist, p, r)
        want = _ref_dtw(g.dist, p, r)
        assert got["DTW"] == pytest.approx(want["DTW"], rel=1e-6)
        assert got["nDTW"] == pytest.approx(want["nDTW"], rel=1e-6)
        assert got["SDTW"] == pytest.approx(want["SDTW"], rel=1e-6)


def test_perfect_path_scores():
    g = _line_graph()
    path = [0, 1, 2, 3]
    s = eval_r2r_item(g.dist, path, path)
    assert s["nav_error"] == 0.0
    assert s["success"] == 1.0
    assert s["spl"] == pytest.approx(1.0)
    assert s["nDTW"] == pytest.approx(1.0)
    assert s["CLS"] == pytest.approx(1.0)


def test_failed_path_scores():
    g = _line_graph()
    s = eval_r2r_item(g.dist, [0, 1], [0, 1, 2, 3, 4])
    # 3 hops * 2m = 6m away -> failure
    assert s["nav_error"] == pytest.approx(6.0)
    assert s["success"] == 0.0
    assert s["spl"] == 0.0
    assert s["oracle_error"] == pytest.approx(6.0)
    # overshoot: oracle picks closest visited node
    s2 = eval_r2r_item(g.dist, [0, 1, 2, 3, 4, 5, 6], [0, 1, 2, 3, 4])
    assert s2["oracle_error"] == 0.0
    assert s2["oracle_success"] == 1.0
    # but final position is 4m past the goal -> not a success
    assert s2["nav_error"] == pytest.approx(4.0)
    assert s2["success"] == 0.0


def test_spl_penalizes_long_paths():
    g = _line_graph()
    direct = eval_r2r_item(g.dist, [0, 1, 2], [0, 1, 2])
    wander = eval_r2r_item(g.dist, [0, 1, 0, 1, 2], [0, 1, 2])
    assert wander["success"] == 1.0
    assert wander["spl"] < direct["spl"]


def test_aggregate_metrics_keys():
    g = _line_graph()
    per = [eval_r2r_item(g.dist, [0, 1, 2], [0, 1, 2])]
    agg = aggregate_metrics(per)
    for k in ["steps", "lengths", "nav_error", "oracle_error", "sr",
              "oracle_sr", "spl", "nDTW", "SDTW", "CLS"]:
        assert k in agg
    assert agg["sr"] == 100.0


def test_fixed_success_is_respected_in_sdtw():
    g = _line_graph()
    s = dtw_scores(g.dist, [0, 1, 2], [0, 1, 2], success=0.0)
    assert s["SDTW"] == 0.0
    assert s["nDTW"] > 0.9


def test_device_dp_extend_matches_incremental_ndtw():
    """The in-scan DTW row extension (rollout._dp_extend) must track
    IncrementalNDTW exactly over random walks."""
    import jax
    import jax.numpy as jnp

    from vln_hamt_tpu.agents.rollout import _dp_extend
    from vln_hamt_tpu.eval.metrics import IncrementalNDTW

    rng = np.random.default_rng(7)
    n, b, r, steps = 20, 5, 6, 10
    pos = rng.standard_normal((n, 3)) * 4
    dist = np.sqrt(((pos[:, None] - pos[None]) ** 2).sum(-1)).astype(np.float32)
    refs = [rng.integers(0, n, r).tolist() for _ in range(b)]
    starts = rng.integers(0, n, b).tolist()
    inc = IncrementalNDTW([dist] * b, refs, starts)

    dp = jnp.full((b, r + 1), jnp.inf).at[:, 0].set(0.0)
    cost = lambda nodes: jnp.asarray(
        np.stack([dist[nd, refs[i]] for i, nd in enumerate(nodes)]))
    nodes = list(starts)
    dp = _dp_extend(dp, cost(nodes))
    for _ in range(steps):
        nodes = rng.integers(0, n, b).tolist()
        for i in range(b):
            inc.update(i, nodes[i])
        dp = _dp_extend(dp, cost(nodes))
        dev_val = np.exp(-np.asarray(dp)[:, r] / (3.0 * r))
        want = np.array([inc.value(i) for i in range(b)])
        np.testing.assert_allclose(dev_val, want, rtol=1e-5)


def test_build_nav_tables_globalization():
    """Global neighbor tables must agree with per-graph tables under
    the sorted-scan offset layout (same layout as the feature table)."""
    from vln_hamt_tpu.data.fixtures import make_synthetic_world
    from vln_hamt_tpu.data.nav_graph import build_nav_tables
    from vln_hamt_tpu.data.feature_db import build_feature_table

    world = make_synthetic_world(num_scans=3, nodes_per_scan=10,
                                 num_items=6, feat_dim=8, seed=5)
    c = max(g.max_degree for g in world.graphs.values())
    nav, offs = build_nav_tables(world.graphs, c)
    _, offs2 = build_feature_table(world.graphs, world.feat_db)
    assert offs == offs2
    for scan, g in world.graphs.items():
        off = offs[scan]
        for u in range(g.num_nodes):
            deg = int((g.nbr_index[u] >= 0).sum())
            row = nav["nbr_global"][off + u]
            assert (row[:deg] == g.nbr_index[u][:deg] + off).all()
            assert (row[deg:] == -1).all()
            np.testing.assert_array_equal(
                nav["nbr_point"][off + u][:deg], g.nbr_point_id[u][:deg])
            np.testing.assert_allclose(
                nav["nbr_head"][off + u][:deg], g.nbr_heading[u][:deg])
