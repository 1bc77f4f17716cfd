#!/bin/bash
# r4r fine-tuning preset (reference: finetune_src/scripts/run_r4r.sh).
python -m vln_hamt_tpu.run.finetune --task r4r \
    --output_dir "${OUTPUT_DIR:-runs/r4r}" \
    "$@"
