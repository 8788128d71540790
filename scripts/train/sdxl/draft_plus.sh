#!/bin/bash
# Launcher (rebuild of reference scripts/train/sdxl/draft_plus.sh). No accelerate: JAX owns the
# devices; multi-chip parallelism comes from the mesh config, not a launcher.
set -euo pipefail
cd "$(dirname "$0")/../../../"
python train/sdxl/draft_plus.py "$@"
