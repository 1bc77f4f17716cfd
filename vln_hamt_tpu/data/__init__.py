from .nav_graph import NavGraph, load_nav_graphs
from .angle import (
    angle_feature,
    angle_features,
    all_point_angle_feature,
    view_heading,
    view_elevation,
    closest_view_index,
    DEG30,
)
from .feature_db import FeatureDB, HDF5FeatureDB, MemoryFeatureDB, SyntheticFeatureDB
from .instructions import load_instr_datasets, construct_instrs

__all__ = [
    "NavGraph",
    "load_nav_graphs",
    "angle_feature",
    "angle_features",
    "all_point_angle_feature",
    "view_heading",
    "view_elevation",
    "closest_view_index",
    "DEG30",
    "FeatureDB",
    "HDF5FeatureDB",
    "MemoryFeatureDB",
    "SyntheticFeatureDB",
    "load_instr_datasets",
    "construct_instrs",
]
