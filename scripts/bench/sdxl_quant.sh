#!/bin/bash
# Launcher (rebuild of reference scripts/bench/sdxl_quant.sh). No accelerate: JAX owns the
# devices; multi-chip parallelism comes from the mesh config, not a launcher.
set -euo pipefail
cd "$(dirname "$0")/../../"
python tools/bench/sdxl_quant.py "$@"
