#!/bin/bash
# cvdn fine-tuning preset (reference: finetune_src/scripts/run_cvdn.sh).
python -m vln_hamt_tpu.run.finetune --task cvdn \
    --output_dir "${OUTPUT_DIR:-runs/cvdn}" \
    "$@"
