#!/usr/bin/env bash
# Full test suite in shards, each sized to finish inside a ~10-minute CI
# window on this single-core host (the suite is compile-dominated; the
# persistent compile cache under /tmp/jax_test_compile_cache makes repeat
# runs much faster).
#
# Timings from a full observed SOLO run on this host (2026-08-17, warm
# compile cache, one core; a concurrent python process inflates any shard
# 2-4x — never overlap shards with other work on this box): see the table
# in README "Testing & benchmarks" (all 6 shards green, 270 tests, 45 min).
#
# Usage: scripts/run_test_shards.sh [shard ...]
#   with no args, runs every shard sequentially and prints a summary.

set -u
cd "$(dirname "$0")/.."

declare -A SHARDS
SHARDS[fast]='-m "not slow" tests/'
SHARDS[slow-sdxl]='-m slow tests/models/test_ip_adapter.py tests/models/test_sdxl.py tests/models/test_sdxl_rope.py tests/models/test_sdxl_parity.py'
SHARDS[slow-models]='-m slow tests/models/test_cogview4.py tests/models/test_prompt_free.py tests/models/test_style_tokenizer.py tests/models/test_jit.py tests/models/test_jit_extensions.py tests/models/test_jit_parity.py tests/models/test_jit_text_encoder.py tests/models/test_sampler_parity.py tests/models/test_timm_vit.py tests/models/test_clip_vision.py'
SHARDS[slow-training-a]='-m slow tests/training/test_rope_distill.py tests/training/test_trainer.py tests/training/test_checkpoint_resume.py tests/training/test_preemption.py tests/training/test_optim8bit.py tests/training/test_int8_training_quality.py tests/training/test_latent_patch4_quality.py tests/training/test_jit_variant_workloads.py'
SHARDS[slow-training-b]='-m slow tests/training/test_sdxl_workload.py tests/training/test_draft_plus.py tests/training/test_prompt_free_workload.py tests/training/test_style_tokenizer_workload.py'
SHARDS[slow-misc]='-m slow tests/ops/ tests/test_tools.py tests/test_reward_pickscore.py tests/test_native_image.py tests/test_latent_cache.py tests/test_aspect_ratio_bucket.py tests/test_data.py tests/test_parallel.py tests/test_peft.py tests/test_configs_library.py tests/test_saving_preview.py tests/test_download.py'

ORDER=(fast slow-sdxl slow-models slow-training-a slow-training-b slow-misc)
RUN=("${@:-${ORDER[@]}}")

overall=0
for name in "${RUN[@]}"; do
  args=${SHARDS[$name]:?unknown shard $name}
  echo "=== shard $name: pytest $args"
  start=$(date +%s)
  eval python -m pytest -q "$args"
  rc=$?
  echo "=== shard $name finished rc=$rc in $(( $(date +%s) - start ))s"
  [ $rc -ne 0 ] && overall=$rc
done
exit $overall
