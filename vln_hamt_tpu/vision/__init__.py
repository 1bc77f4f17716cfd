from .featurizer import PanoramaFeaturizer
from .transforms import (
    ImageTransform,
    eval_transform,
    normalize_images,
    train_transform,
)
from .vit import ViT, init_vit_params, vit_base_patch16

__all__ = [
    "ViT",
    "vit_base_patch16",
    "init_vit_params",
    "PanoramaFeaturizer",
    "ImageTransform",
    "eval_transform",
    "train_transform",
    "normalize_images",
]
