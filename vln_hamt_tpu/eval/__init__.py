from .metrics import (
    dtw_scores,
    cls_score,
    eval_r2r_item,
    aggregate_metrics,
    batch_ndtw,
    IncrementalNDTW,
)

__all__ = [
    "dtw_scores",
    "cls_score",
    "eval_r2r_item",
    "aggregate_metrics",
    "batch_ndtw",
]
