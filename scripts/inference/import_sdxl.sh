#!/usr/bin/env bash
# Real-weight SDXL drop-in validation: strict load -> forward -> generate
# (-> quant matrix with --quant-matrix). Usage:
#   scripts/inference/import_sdxl.sh /path/to/sdxl.safetensors [extra flags]
set -euo pipefail
CKPT="${1:?usage: import_sdxl.sh <checkpoint.safetensors> [flags]}"
shift || true
python tools/checkpoint/import_sdxl.py --checkpoint-path "$CKPT" "$@"
