#!/bin/bash
# Launcher (rebuild of reference scripts/data/wd_tagger.sh): tags an image
# folder with a wd-tagger model via the external `tagger` CLI. The tagger
# model needs downloading, which this environment cannot do (no egress) —
# run on a machine with network access; output format matches what
# TextToImageDatasetConfig's metadata reader consumes (wd-tagger json).
set -euo pipefail

MODEL=${MODEL:-eva02-large}
BATCH_SIZE=${BATCH_SIZE:-32}
FORMAT=${FORMAT:-json}

if ! command -v tagger >/dev/null; then
  echo "error: the 'tagger' CLI is not installed (pip install wdtagger-cli" >&2
  echo "on a machine with network egress)." >&2
  exit 1
fi

tagger v3 --model "$MODEL" --batch-size "$BATCH_SIZE" --format "$FORMAT" "$@"
