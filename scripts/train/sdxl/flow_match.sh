#!/bin/bash
# Launcher (rebuild of reference scripts/train/sdxl/flow_match.sh). No accelerate: JAX owns the
# devices; multi-chip parallelism comes from the mesh config, not a launcher.
set -euo pipefail
cd "$(dirname "$0")/../../../"
python train/sdxl/flow_match.py "$@"
