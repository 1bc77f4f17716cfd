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


# ------------------------------------------------- annotation loaders
# Golden-value tests on tiny REFERENCE-FORMAT fixture files for all 7
# datasets: ids, clip direction, and item counts must match the
# reference loaders exactly (r2r/data_utils.py:26-83,
# reverie/data_utils.py:45-88, cvdn/main.py:24-31).

def _r2r_items(n_path=2, n_instr=2, enc_len=8):
    items = []
    for p in range(n_path):
        items.append({
            "path_id": 1000 + p,
            "scan": "scan0",
            "heading": 0.5,
            "path": ["va", "vb", "vc"],
            "instructions": [f"instr {p} {j}" for j in range(n_instr)],
            "instr_encodings": [
                [101] + [200 + p * 10 + j] * enc_len + [102]
                for j in range(n_instr)
            ],
        })
    return items


@pytest.fixture()
def anno_dir(tmp_path):
    from vln_hamt_tpu.data.instructions import construct_instrs  # noqa: F401

    d = tmp_path / "anno"
    d.mkdir()
    (d / "LastSent").mkdir()
    (d / "ReturnBack").mkdir()
    with open(d / "R2R_val_enc.json", "w") as f:
        json.dump(_r2r_items(), f)
    with open(d / "LastSent" / "R2R_val_enc.json", "w") as f:
        json.dump(_r2r_items(n_path=1), f)
    back = _r2r_items(n_path=1)
    back[0]["midstop"] = "vb"
    with open(d / "ReturnBack" / "R2R_val_enc.json", "w") as f:
        json.dump(back, f)
    with open(d / "R4R_val_enc.json", "w") as f:
        json.dump(_r2r_items(n_path=3, n_instr=1), f)
    # RxR: jsonl, already per-instruction; one GT item + one test item
    with open(d / "rxr_val_guide_enc_xlmr.jsonl", "w") as f:
        f.write(json.dumps({
            "path_id": 7, "instruction_id": 70, "scan": "scan0",
            "path": ["va", "vb"], "heading": 0.0,
            "instr_encoding": list(range(600)),
        }) + "\n")
        f.write(json.dumps({
            "instruction_id": 71, "scan": "scan0",
            "path": ["va"], "heading": 0.0,
            "instr_encoding": [1, 2, 3],
        }) + "\n")
    # REVERIE: objId in train/val ids; test split has neither objId nor
    # path_id (reverie/data_utils.py:66-77)
    rev = _r2r_items(n_path=2)
    rev[0]["objId"] = 66
    rev[1]["objId"] = 67
    with open(d / "REVERIE_val_enc.json", "w") as f:
        json.dump(rev, f)
    rev_test = _r2r_items(n_path=1)
    for it in rev_test:
        del it["path_id"]
        it["id"] = "rtest0"
    with open(d / "REVERIE_test_enc.json", "w") as f:
        json.dump(rev_test, f)
    # xlmr annotation variant (reverie/data_utils.py:49-53)
    rev_x = _r2r_items(n_path=1)
    rev_x[0]["objId"] = 99
    with open(d / "REVERIE_val_enc_xlmr.json", "w") as f:
        json.dump(rev_x, f)
    # CVDN/NDH: unexpanded items with a single pre-encoded dialog
    with open(d / "val_enc.json", "w") as f:
        json.dump([{
            "instr_id": "901_0", "scan": "scan0",
            "start_pano": "va", "start_heading": 1.1,
            "end_panos": ["vc", "vd"],
            "nav_steps": ["va", "vb", "vc"], "nav_idx": 1,
            "instr_encoding": list(range(600)),
        }, {
            # GT-less test item: no end_panos
            "instr_id": "902_0", "scan": "scan0",
            "start_pano": "vb", "start_heading": 0.0,
            "instr_encoding": [5, 6, 7],
        }], f)
    return str(d)


def test_construct_instrs_r2r_family(anno_dir):
    from vln_hamt_tpu.data.instructions import construct_instrs

    items = construct_instrs(anno_dir, "r2r", ["val"], max_instr_len=6)
    assert [it["instr_id"] for it in items] == [
        "1000_0", "1000_1", "1001_0", "1001_1"]
    for it in items:
        # head clip (data_utils.py:74)
        assert len(it["instr_encoding"]) == 6
        assert it["instr_encoding"][0] == 101
        assert "instructions" not in it and "instr_encodings" not in it
    assert items[1]["instruction"] == "instr 0 1"

    assert len(construct_instrs(anno_dir, "r2r_last", ["val"])) == 2
    back = construct_instrs(anno_dir, "r2r_back", ["val"])
    assert back[0]["midstop"] == "vb"
    assert len(construct_instrs(anno_dir, "r4r", ["val"])) == 3


def test_construct_instrs_rxr(anno_dir):
    from vln_hamt_tpu.data.instructions import construct_instrs

    items = construct_instrs(anno_dir, "rxr", ["val"], max_instr_len=100)
    assert len(items) == 2
    assert items[0]["instr_id"] == "7_70"
    # head clip (data_utils.py:66)
    assert items[0]["instr_encoding"] == list(range(100))
    # test item: path_id = instr_id = str(instruction_id) (:64-65)
    assert items[1]["instr_id"] == "71"
    assert items[1]["path_id"] == "71"


def test_construct_instrs_reverie(anno_dir):
    from vln_hamt_tpu.data.instructions import construct_instrs

    items = construct_instrs(anno_dir, "reverie", ["val"])
    # instr_id includes the objId (reverie/data_utils.py:72-73)
    assert [it["instr_id"] for it in items] == [
        "1000_66_0", "1000_66_1", "1001_67_0", "1001_67_1"]
    # test split: id fallback, objId None (:74-77)
    test_items = construct_instrs(anno_dir, "reverie", ["test"])
    assert [it["instr_id"] for it in test_items] == ["rtest0_0", "rtest0_1"]
    assert all(it["objId"] is None for it in test_items)
    assert all(it["path_id"] == "rtest0" for it in test_items)
    # xlmr annotation file variant (:49-53)
    x = construct_instrs(anno_dir, "reverie", ["val"], tokenizer="xlm")
    assert [it["instr_id"] for it in x] == ["1000_99_0", "1000_99_1"]
    with pytest.raises(ValueError):
        construct_instrs(anno_dir, "reverie", ["val"], tokenizer="gpt")


def test_construct_instrs_cvdn(anno_dir):
    from vln_hamt_tpu.data.instructions import construct_instrs

    items = construct_instrs(anno_dir, "cvdn", ["val"], max_instr_len=100)
    # NDH items pass through UNEXPANDED (cvdn/main.py:28-30)
    assert len(items) == 2
    assert items[0]["instr_id"] == "901_0"
    assert items[0]["nav_steps"] == ["va", "vb", "vc"]
    # TAIL clip: the most recent dialog turns survive (cvdn/main.py:29)
    assert items[0]["instr_encoding"] == list(range(500, 600))
    assert items[1]["instr_encoding"] == [5, 6, 7]


def test_rxr_preset_matches_reference_model_config():
    """The rxr preset's model fields pin to the reference's
    rxr_xlm_model_config.json — notably type_vocab_size stays 2 even
    for XLM-R (the trunk's obs embedding uses token type 1; the
    reference duplicates XLM-R's single row at init,
    main_r2r.py:139-143)."""
    import json

    from vln_hamt_tpu.configs import get_preset

    with open("/root/reference/pretrain_src/config/"
              "rxr_xlm_model_config.json") as f:
        ref = json.load(f)
    m = get_preset("rxr").model
    for field in ("hidden_size", "image_feat_size", "angle_feat_size",
                  "image_prob_size", "intermediate_size", "num_l_layers",
                  "num_x_layers", "num_h_pano_layers",
                  "max_position_embeddings", "max_action_steps",
                  "num_attention_heads", "type_vocab_size", "vocab_size"):
        assert getattr(m, field) == ref[field], (field, getattr(m, field),
                                                 ref[field])
