#!/usr/bin/env bash
# Released-checkpoint evaluation runbook (ROADMAP.md §1) as ONE command.
#
# The day real assets exist (Matterport connectivity, R2R annotations,
# a timm ViT checkpoint, a released HAMT agent checkpoint —
# reference README.md:36), this script runs the full chain:
#   features -> weight conversion -> greedy val_unseen eval -> submit
#
# Real data:
#   scripts/eval_released_ckpt.sh \
#     --task r2r --ref_ckpt /path/best_val_unseen \
#     --anno_dir DATA/annotations --connectivity_dir DATA/connectivity \
#     --img_ft_file feats.hdf5            # or: --pano_dir ... --vit_ckpt vit.pth
#     [--output_dir runs/eval_released]
#
# Dry run (no assets needed; synthetic stand-ins shaped EXACTLY like the
# real files — reference-format connectivity JSONs, R2R_{split}_enc.json
# annotations, a scan_viewpoint-keyed HDF5, and a torch agent checkpoint
# in the Seq2SeqCMTAgent.save layout with module.vln_bert.* keys):
#   scripts/eval_released_ckpt.sh --dryrun
set -euo pipefail

TASK=r2r
REF_CKPT=""
ANNO_DIR=""
CONN_DIR=""
IMG_FT_FILE=""
PANO_DIR=""
VIT_CKPT=""
OUTPUT_DIR="runs/eval_released"
DRYRUN=0
TINY_FLAG=""

while [[ $# -gt 0 ]]; do
  case "$1" in
    --task) TASK="$2"; shift 2 ;;
    --ref_ckpt) REF_CKPT="$2"; shift 2 ;;
    --anno_dir) ANNO_DIR="$2"; shift 2 ;;
    --connectivity_dir) CONN_DIR="$2"; shift 2 ;;
    --img_ft_file) IMG_FT_FILE="$2"; shift 2 ;;
    --pano_dir) PANO_DIR="$2"; shift 2 ;;
    --vit_ckpt) VIT_CKPT="$2"; shift 2 ;;
    --output_dir) OUTPUT_DIR="$2"; shift 2 ;;
    --dryrun) DRYRUN=1; shift ;;
    *) echo "unknown flag $1" >&2; exit 2 ;;
  esac
done

cd "$(dirname "$0")/.."

if [[ "$DRYRUN" == 1 ]]; then
  # Fabricate real-format stand-ins + a tiny reference checkpoint, then
  # run the EXACT same command path as the real-data branch below.
  WORK="${TMPDIR:-/tmp}/eval_released_dryrun"
  rm -rf "$WORK"; mkdir -p "$WORK"
  python - "$WORK" << 'PYEOF'
import sys

import torch

work = sys.argv[1]

from vln_hamt_tpu.data.fixtures import export_real_format, make_synthetic_world

world = make_synthetic_world(num_scans=2, nodes_per_scan=12, num_items=12,
                             feat_dim=32, seed=7)
paths = export_real_format(world, work)
print("assets:", paths)

# a reference-format agent checkpoint at the --tiny dims (the real one
# is full-size; name/shape-matched loading is identical either way)
sys.path.insert(0, "/root/reference/finetune_src")
from models.vilmodel_cmt import NavCMT
from transformers import BertConfig

cfg = BertConfig(vocab_size=30522, hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, intermediate_size=128,
                 max_position_embeddings=128, type_vocab_size=2)
cfg.img_feature_type = ""
cfg.image_feat_size = 32
cfg.angle_feat_size = 4
cfg.num_l_layers = 2
cfg.num_r_layers = 0
cfg.num_h_layers = 0
cfg.num_x_layers = 1
cfg.hist_enc_pano = True
cfg.num_h_pano_layers = 1
cfg.fix_lang_embedding = False
cfg.fix_hist_embedding = False
cfg.fix_obs_embedding = False
cfg.update_lang_bert = True
cfg.output_attentions = False
cfg.pred_head_dropout_prob = 0.1
cfg.max_action_steps = 32
cfg.no_lang_ca = False
cfg.act_pred_token = "ob_txt"
torch.manual_seed(0)
ref = NavCMT(cfg)
critic_sd = {
    "module.state2value.0.weight": torch.randn(512, 64),
    "module.state2value.0.bias": torch.randn(512),
    "module.state2value.3.weight": torch.randn(1, 512),
    "module.state2value.3.bias": torch.randn(1),
}
torch.save({
    "vln_bert": {"epoch": 1, "state_dict": {
        "module.vln_bert." + k: v for k, v in ref.state_dict().items()}},
    "critic": {"epoch": 1, "state_dict": critic_sd},
}, f"{work}/ref_agent.pt")
print("checkpoint:", f"{work}/ref_agent.pt")
PYEOF
  REF_CKPT="$WORK/ref_agent.pt"
  ANNO_DIR="$WORK/annotations"
  CONN_DIR="$WORK/connectivity"
  IMG_FT_FILE="$WORK/features.hdf5"
  OUTPUT_DIR="$WORK/out"
  # tiny dims + CPU backend: the dry run must not occupy the real TPU
  TINY_FLAG="--tiny --cpu"
fi

[[ -n "$REF_CKPT" && -n "$ANNO_DIR" && -n "$CONN_DIR" ]] || {
  echo "need --ref_ckpt, --anno_dir, --connectivity_dir (or --dryrun)" >&2
  exit 2
}

# Stage 1 — ViT panorama features (skip when an HDF5 is already given).
# The CLI defaults are reference-faithful since round 5: render 640x480
# at VFOV 60, bicubic resize shorter-side->248, center-crop 224,
# normalize mean=std=0.5 (the timm config of the reference extractor,
# precompute_img_features_vit.py:37-52) — features regenerated here are
# interchangeable with reference-extracted ones
# (tests/test_image_transform.py golden-pins the transform).
if [[ -z "$IMG_FT_FILE" ]]; then
  [[ -n "$PANO_DIR" && -n "$VIT_CKPT" ]] || {
    echo "need --img_ft_file, or --pano_dir + --vit_ckpt to extract" >&2
    exit 2
  }
  IMG_FT_FILE="$OUTPUT_DIR/features.hdf5"
  mkdir -p "$OUTPUT_DIR"
  python -m vln_hamt_tpu.run.precompute_features \
    --output_file "$IMG_FT_FILE" \
    --connectivity_dir "$CONN_DIR" \
    --pano_dir "$PANO_DIR" \
    --vit_ckpt "$VIT_CKPT"
fi

# Stage 2+3 — convert the released checkpoint + greedy full-split eval
# (+ submission files). init_ref_ckpt handles both released formats
# (agent save / pretrain ModelSaver; models/convert.py).
python -m vln_hamt_tpu.run.finetune \
  --task "$TASK" $TINY_FLAG \
  --valid_only --submit --eval_first \
  --init_ref_ckpt "$REF_CKPT" \
  --anno_dir "$ANNO_DIR" \
  --connectivity_dir "$CONN_DIR" \
  --img_ft_file "$IMG_FT_FILE" \
  --output_dir "$OUTPUT_DIR"

echo "done: predictions + metrics under $OUTPUT_DIR"
