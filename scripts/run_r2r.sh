#!/bin/bash
# R2R fine-tuning (reference: finetune_src/scripts/run_r2r.sh — 300k
# iters, batch 8, adamW 1e-5, ViT-B/16 768-d features, IL+RL).
# Pass real data dirs or --synthetic for a hermetic run.
python -m vln_hamt_tpu.run.finetune --task r2r \
    --output_dir "${OUTPUT_DIR:-runs/r2r}" \
    "$@"
