from .vit import ViT, vit_base_patch16, init_vit_params
from .featurizer import PanoramaFeaturizer

__all__ = ["ViT", "vit_base_patch16", "init_vit_params", "PanoramaFeaturizer"]
