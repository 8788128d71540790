#!/bin/bash
# Launcher (rebuild of reference scripts/train/jit/class_to_image_cross.sh). No accelerate: JAX owns the
# devices; multi-chip parallelism comes from the mesh config, not a launcher.
set -euo pipefail
cd "$(dirname "$0")/../../../"
python train/jit/class_to_image_cross.py "$@"
