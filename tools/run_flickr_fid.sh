#!/usr/bin/env bash
# North-star FID validation from the released flickr checkpoints.
#
# Protocol parity: reference ml-mdm-matryoshka/ml_mdm/clis/
# run_torchmetrics.py:85-171 (FID via torchmetrics Inception features,
# feature layer 2048, over >= --min-examples samples; CLIPScore via
# openai/clip-vit-base-patch16), checkpoints from the reference README
# pretrained table (/root/reference/README.md:75-77).
#
# NETWORK REQUIRED (checkpoint + Inception/CLIP weight downloads) — the
# build sandbox has zero egress, so this script is shipped ready-to-run
# for the day network exists. Everything it drives (the .pth converter,
# generate_batch, run_torchmetrics) is already exercised offline by the
# test suite at the exact flickr architectures
# (tests/test_checkpoint_compat.py, tests/test_multiprocess_generate.py,
# tests/test_metrics.py).
set -euo pipefail

SIZE="${1:-64}"                      # 64 | 256 | 1024
MIN_EXAMPLES="${2:-10000}"           # reference default (config.py:209-213)
WORK="${WORK:-/tmp/flickr_fid_${SIZE}}"
ASSET=https://docs-assets.developer.apple.com/ml-research/models/mdm
REPO="$(cd "$(dirname "$0")/.." && pwd)"

case "$SIZE" in
  64)   CKPT=$ASSET/flickr64/vis_model.pth;   CFG=configs/models/cc12m_64x64.yaml ;;
  256)  CKPT=$ASSET/flickr256/vis_model.pth;  CFG=configs/models/cc12m_256x256.yaml ;;
  1024) CKPT=$ASSET/flickr1024/vis_model.pth; CFG=configs/models/cc12m_1024x1024.yaml ;;
  *) echo "usage: $0 [64|256|1024] [min_examples]" >&2; exit 2 ;;
esac

mkdir -p "$WORK"
cd "$REPO"

if [ ! -f "$WORK/vis_model.pth" ]; then
  echo "== downloading $CKPT"
  curl -L "$CKPT" --output "$WORK/vis_model.pth"
fi

# validation captions: reference protocol evaluates on a held-out TSV
# (test_file_list). Point VALIDATION_TSV at a cc12m/flickr validation
# index; the vendored prompt files work for a quick smoke pass.
VALIDATION_TSV="${VALIDATION_TSV:-data/prompts_demo.tsv}"

echo "== generating >= $MIN_EXAMPLES samples at ${SIZE}px (sharded over hosts)"
python -m ml_mdm_tpu.clis.generate_batch \
  --config_path "$CFG" \
  --model-file "$WORK/vis_model.pth" \
  --sample-dir "$WORK/samples" \
  --test-file-list "$VALIDATION_TSV" \
  --sample-image-size "$SIZE" \
  --min-examples "$MIN_EXAMPLES"

echo "== FID (Inception-2048) + CLIPScore"
python -m ml_mdm_tpu.clis.run_torchmetrics \
  --sample-dir "$WORK/samples" \
  --min-examples "$MIN_EXAMPLES" \
  --metrics fid,clip \
  --feature-extractor inception --feature-layer 2048 \
  --output-json "$WORK/metrics.json"

cat "$WORK/metrics.json"
