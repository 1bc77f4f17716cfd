#!/bin/bash
# r2r_last fine-tuning preset (reference: finetune_src/scripts/run_r2r_last.sh).
python -m vln_hamt_tpu.run.finetune --task r2r_last \
    --output_dir "${OUTPUT_DIR:-runs/r2r_last}" \
    "$@"
