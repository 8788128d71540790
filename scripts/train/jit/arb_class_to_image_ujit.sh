#!/bin/bash
# Launcher (rebuild of reference scripts/train/jit/arb_class_to_image_ujit.sh). No accelerate: JAX owns the
# devices; multi-chip parallelism comes from the mesh config, not a launcher.
set -euo pipefail
cd "$(dirname "$0")/../../../"
python train/jit/arb_class_to_image_ujit.py "$@"
