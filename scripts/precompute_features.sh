#!/bin/bash
# 36-view ViT feature extraction (reference:
# preprocess/precompute_img_features_vit.py).
python -m vln_hamt_tpu.run.precompute_features "$@"
