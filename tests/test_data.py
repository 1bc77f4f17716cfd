import json
import math

import numpy as np
import pytest

from vln_hamt_tpu.data.angle import (
    DEG30,
    all_point_angle_feature,
    angle_feature,
    angle_features,
    closest_view_index,
    view_elevation,
    view_heading,
)
from vln_hamt_tpu.data.nav_graph import NavGraph, _parse_connectivity
from vln_hamt_tpu.data.feature_db import SyntheticFeatureDB
from vln_hamt_tpu.data.fixtures import make_synthetic_graph, make_synthetic_world


# ---------------------------------------------------------------- angles
def test_angle_feature_reference_parity():
    # golden: data_utils.py:114-117 formula
    h, e = 0.7, -0.3
    got = angle_feature(h, e, 4)
    want = np.array([math.sin(h), math.cos(h), math.sin(e), math.cos(e)], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got8 = angle_feature(h, e, 8)
    np.testing.assert_allclose(got8, np.tile(want, 2), rtol=1e-6)


def test_view_geometry():
    assert view_heading(0) == 0.0
    assert view_heading(13) == pytest.approx(DEG30)
    assert view_elevation(5) == pytest.approx(-DEG30)
    assert view_elevation(17) == 0.0
    assert view_elevation(30) == pytest.approx(DEG30)


def test_closest_view_index():
    # straight north at horizon -> view 12
    assert closest_view_index(0.0, 0.0) == 12
    # slightly past 15 deg rounds up to heading 1
    assert closest_view_index(np.deg2rad(16), 0.0) == 13
    # looking up beyond +45 clips to top level
    assert closest_view_index(0.0, np.deg2rad(80)) == 24
    # negative heading wraps
    assert closest_view_index(-DEG30, 0.0) == 23


def test_all_point_angle_feature_table():
    tab = all_point_angle_feature(4)
    assert tab.shape == (36, 36, 4)
    # relative heading of view 13 from base 12 is +30deg; elevation 0
    np.testing.assert_allclose(
        tab[12, 13], [math.sin(DEG30), math.cos(DEG30), 0.0, 1.0], atol=1e-6
    )
    # base view heading only depends on base % 12
    np.testing.assert_allclose(tab[0], tab[12], atol=1e-6)


# ------------------------------------------------------------- nav graph
def test_nav_graph_shortest_paths():
    # a 4-node path graph 0-1-2-3 with unit spacing
    pos = np.array([[0, 0, 0], [0, 2, 0], [0, 4, 0], [0, 6, 0]], float)
    adj = np.zeros((4, 4), bool)
    for a, b in [(0, 1), (1, 2), (2, 3)]:
        adj[a, b] = adj[b, a] = True
    g = NavGraph("s", ["a", "b", "c", "d"], pos, adj)
    assert g.dist[0, 3] == pytest.approx(6.0)
    assert g.shortest_path(0, 3) == [0, 1, 2, 3]
    assert g.next_hop[0, 3] == 1
    assert g.path_length([0, 1, 2, 3]) == pytest.approx(6.0)


def test_nav_graph_neighbor_geometry():
    # neighbor due north at same height -> heading 0, elevation 0, view 12
    pos = np.array([[0, 0, 0], [0, 3, 0]], float)
    adj = np.array([[False, True], [True, False]])
    g = NavGraph("s", ["a", "b"], pos, adj)
    assert g.nbr_index[0, 0] == 1
    assert g.nbr_heading[0, 0] == pytest.approx(0.0)
    assert g.nbr_point_id[0, 0] == 12
    # reverse direction: heading pi -> view 18
    assert g.nbr_point_id[1, 0] == 18


def test_connectivity_json_parsing(tmp_path):
    def pose(x, y, z):
        p = [0.0] * 16
        p[3], p[7], p[11] = x, y, z
        return p

    raw = [
        {"image_id": "v0", "included": True, "pose": pose(0, 0, 0),
         "unobstructed": [False, True, False]},
        {"image_id": "v1", "included": True, "pose": pose(0, 3, 0),
         "unobstructed": [True, False, True]},
        {"image_id": "v2", "included": False, "pose": pose(0, 6, 0),
         "unobstructed": [False, True, False]},
    ]
    g = _parse_connectivity("scanX", raw)
    # excluded node dropped entirely
    assert g.node_ids == ["v0", "v1"]
    assert g.adj[0, 1] and g.adj[1, 0]
    assert g.dist[0, 1] == pytest.approx(3.0)


def test_synthetic_world_consistency(world):
    assert len(world.instr_data) == 24
    for item in world.instr_data:
        g = world.graphs[item["scan"]]
        idx = g.indices(item["path"])
        # consecutive path nodes must be adjacent
        for a, b in zip(idx[:-1], idx[1:]):
            assert g.adj[a, b]
        ft = world.feat_db.get(item["scan"], item["path"][0])
        assert ft.shape == (36, 768)
        # deterministic
        np.testing.assert_array_equal(
            ft, SyntheticFeatureDB(768).get(item["scan"], item["path"][0])
        )


def test_synthetic_graph_degree_bound():
    g = make_synthetic_graph("degtest", 40)
    assert g.max_degree <= 12
