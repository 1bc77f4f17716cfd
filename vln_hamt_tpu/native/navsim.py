"""ctypes bindings for the native navsim library (native/navsim.cpp).

The C++ core mirrors :class:`~vln_hamt_tpu.data.nav_graph.NavGraph` and
:class:`~vln_hamt_tpu.env.sim.GraphSimulator` (the render-off
MatterSim-equivalent) and adds the equirect panorama sampler used by
preprocessing. The library is built on demand with ``make -C native``
(g++ is in the image; pybind11 is not, hence the C ABI).

The pure-numpy implementations remain the reference semantics; the
native path accelerates the O(V^3) per-scan startup and the
36-view sampling hot loop, and parity is enforced by tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libnavsim.so")

_lib: Optional[ctypes.CDLL] = None


def load_library(build_if_missing: bool = True) -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and build_if_missing:
        subprocess.run(["make", "-C", _NATIVE_DIR, "libnavsim.so"],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(_SO_PATH)

    c = ctypes
    lib.navsim_graph_create.restype = c.c_void_p
    lib.navsim_graph_create.argtypes = [c.c_int, c.c_void_p, c.c_void_p]
    lib.navsim_graph_destroy.argtypes = [c.c_void_p]
    lib.navsim_graph_max_degree.restype = c.c_int
    lib.navsim_graph_max_degree.argtypes = [c.c_void_p]
    lib.navsim_graph_dist.argtypes = [c.c_void_p, c.c_void_p]
    lib.navsim_graph_next_hop.argtypes = [c.c_void_p, c.c_void_p]
    lib.navsim_graph_neighbors.argtypes = [c.c_void_p] + [c.c_void_p] * 4
    lib.navsim_batch_create.restype = c.c_void_p
    lib.navsim_batch_create.argtypes = [c.c_int]
    lib.navsim_batch_destroy.argtypes = [c.c_void_p]
    lib.navsim_new_episode.argtypes = [c.c_void_p, c.c_int, c.c_void_p,
                                       c.c_int, c.c_double, c.c_double]
    lib.navsim_move.restype = c.c_int
    lib.navsim_move.argtypes = [c.c_void_p, c.c_int, c.c_int, c.c_int]
    lib.navsim_state.argtypes = [c.c_void_p, c.c_int, c.c_void_p, c.c_void_p]
    lib.navsim_sample_view.argtypes = [
        c.c_void_p, c.c_int, c.c_int, c.c_double, c.c_double, c.c_double,
        c.c_int, c.c_int, c.c_void_p]
    lib.navsim_sample_panorama.argtypes = [
        c.c_void_p, c.c_int, c.c_int, c.c_double, c.c_int, c.c_int, c.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class NativeNavGraph:
    """Native twin of NavGraph: same dense tables, built in C++."""

    def __init__(self, positions: np.ndarray, adjacency: np.ndarray):
        lib = load_library()
        self._lib = lib
        n = positions.shape[0]
        self.num_nodes = n
        pos = np.ascontiguousarray(positions, dtype=np.float64)
        adj = np.ascontiguousarray(adjacency, dtype=np.uint8)
        self._h = lib.navsim_graph_create(n, _ptr(pos), _ptr(adj))
        self.max_degree = lib.navsim_graph_max_degree(self._h)

        self.dist = np.empty((n, n), np.float32)
        lib.navsim_graph_dist(self._h, _ptr(self.dist))
        self.next_hop = np.empty((n, n), np.int32)
        lib.navsim_graph_next_hop(self._h, _ptr(self.next_hop))
        d = max(self.max_degree, 1)
        self.nbr_index = np.empty((n, self.max_degree), np.int32)
        self.nbr_heading = np.empty((n, self.max_degree), np.float32)
        self.nbr_elevation = np.empty((n, self.max_degree), np.float32)
        self.nbr_point_id = np.empty((n, self.max_degree), np.int32)
        if self.max_degree > 0:
            lib.navsim_graph_neighbors(
                self._h, _ptr(self.nbr_index), _ptr(self.nbr_heading),
                _ptr(self.nbr_elevation), _ptr(self.nbr_point_id))

    @property
    def handle(self):
        return self._h

    def __del__(self):
        try:
            self._lib.navsim_graph_destroy(self._h)
        except Exception:
            pass


class NativeSimBatch:
    """Native twin of GraphSimulator's per-slot episode state."""

    def __init__(self, batch_size: int):
        self._lib = load_library()
        self._h = self._lib.navsim_batch_create(batch_size)
        self.batch_size = batch_size

    def new_episode(self, slot: int, graph: NativeNavGraph, node: int,
                    heading: float, elevation: float = 0.0) -> None:
        self._lib.navsim_new_episode(self._h, slot, graph.handle, node,
                                     heading, elevation)

    def move(self, slot: int, target_node: int, target_view: int) -> None:
        rc = self._lib.navsim_move(self._h, slot, target_node, target_view)
        if rc != 0:
            raise ValueError(f"slot {slot}: target {target_node} not adjacent")

    def state(self, slot: int):
        node = ctypes.c_int32()
        view = ctypes.c_int32()
        self._lib.navsim_state(self._h, slot, ctypes.byref(node),
                               ctypes.byref(view))
        return int(node.value), int(view.value)

    def __del__(self):
        try:
            self._lib.navsim_batch_destroy(self._h)
        except Exception:
            pass


def sample_panorama(equirect: np.ndarray, vfov: float = np.pi / 3,
                    width: int = 640, height: int = 480) -> np.ndarray:
    """(eq_h, eq_w, 3) uint8 equirect -> (36, height, width, 3) views."""
    lib = load_library()
    eq = np.ascontiguousarray(equirect, dtype=np.uint8)
    eq_h, eq_w = eq.shape[:2]
    out = np.empty((36, height, width, 3), np.uint8)
    lib.navsim_sample_panorama(_ptr(eq), eq_w, eq_h, float(vfov),
                               width, height, _ptr(out))
    return out
