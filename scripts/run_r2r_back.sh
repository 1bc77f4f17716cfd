#!/bin/bash
# r2r_back fine-tuning preset (reference: finetune_src/scripts/run_r2r_back.sh).
python -m vln_hamt_tpu.run.finetune --task r2r_back \
    --output_dir "${OUTPUT_DIR:-runs/r2r_back}" \
    "$@"
