#!/bin/bash
# Launcher (rebuild of reference scripts/quantize_model.sh). No accelerate: JAX owns the
# devices; multi-chip parallelism comes from the mesh config, not a launcher.
set -euo pipefail
cd "$(dirname "$0")/../"
python tools/quantize_model.py "$@"
