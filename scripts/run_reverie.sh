#!/bin/bash
# reverie fine-tuning preset (reference: finetune_src/scripts/run_reverie.sh).
python -m vln_hamt_tpu.run.finetune --task reverie \
    --output_dir "${OUTPUT_DIR:-runs/reverie}" \
    "$@"
