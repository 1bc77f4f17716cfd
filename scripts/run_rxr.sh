#!/bin/bash
# rxr fine-tuning preset (reference: finetune_src/scripts/run_rxr.sh).
python -m vln_hamt_tpu.run.finetune --task rxr \
    --output_dir "${OUTPUT_DIR:-runs/rxr}" \
    "$@"
