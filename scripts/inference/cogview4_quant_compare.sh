#!/bin/bash
# Launcher (rebuild of reference scripts/inference/cogview4_quant_compare.sh). No accelerate: JAX owns the
# devices; multi-chip parallelism comes from the mesh config, not a launcher.
set -euo pipefail
cd "$(dirname "$0")/../../"
python tools/cogview4_quant_compare.py "$@"
