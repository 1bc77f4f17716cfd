from .navsim import (
    NativeNavGraph,
    NativeSimBatch,
    native_available,
    load_library,
    sample_panorama,
)

__all__ = [
    "NativeNavGraph",
    "NativeSimBatch",
    "native_available",
    "load_library",
    "sample_panorama",
]
