#!/bin/bash
# Proxy-task pretraining (reference: pretrain_src/config/pretrain_r2r.json —
# 200k steps, batch 16, mix [5,1,1,1,2,2], warmup 10k).
python -m vln_hamt_tpu.run.pretrain \
    --output_dir "${OUTPUT_DIR:-runs/pretrain_r2r}" \
    "$@"
