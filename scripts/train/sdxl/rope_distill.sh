#!/bin/bash
# Launcher (rebuild of reference scripts/train/sdxl/rope_distill.sh). No accelerate: JAX owns the
# devices; multi-chip parallelism comes from the mesh config, not a launcher.
set -euo pipefail
cd "$(dirname "$0")/../../../"
python train/sdxl/rope_distill.py "$@"
