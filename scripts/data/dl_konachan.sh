#!/bin/bash
# Launcher (rebuild of reference scripts/data/dl_konachan.sh). No accelerate: JAX owns the
# devices; multi-chip parallelism comes from the mesh config, not a launcher.
set -euo pipefail
cd "$(dirname "$0")/../../"
python tools/data/download.py konachan "$@"
