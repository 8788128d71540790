"""Mixed-bucket (multi-resolution) training through the full Trainer
(VERDICT r3 #4, driver config #5 semantics): one epoch streams >= 3 compiled
shapes; per-shape compile caching, accumulation + EMA across shape switches,
and index-level resume landing in the right bucket are all asserted.

Reference analog: ``src/dataset/bucket.py:95-121`` + ``src/trainer/common.py:
308-374`` (the ARB stream feeding one loop); the TPU design maps each bucket
resolution onto one XLA executable (SURVEY §2.2 key design fact).
"""

import json
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from vision_pt_tpu.config import OptimizerConfig, TrainConfig, TrainerConfig
from vision_pt_tpu.data.square_class_image import (
    SyntheticMultiResolutionDatasetConfig,
)
from vision_pt_tpu.training.trainer import Trainer
from vision_pt_tpu.workloads.jit_class_to_image import (
    JiTForClassToImageTraining,
)

SIZES = [16, 24, 32]


def _train_config(tmpdir: str | None = None, **trainer_kw) -> TrainConfig:
    label2id_path = tempfile.mktemp(suffix=".json")
    with open(label2id_path, "w") as f:
        json.dump({f"c{i}": i for i in range(4)}, f)
    return TrainConfig(
        model={
            "context_encoder": {
                "type": "class", "label2id_map_path": label2id_path,
            },
            "denoiser": {
                "patch_size": 8, "hidden_size": 64, "depth": 2,
                "num_heads": 2, "bottleneck_dim": 16, "context_dim": 32,
                "context_start_block": 0, "rope_axes_dims": [16, 8, 8],
                "num_time_tokens": 2,
            },
            "max_token_length": 4,
        },
        dataset={
            "num_classes": 4, "items_per_bucket": 8,
            "image_sizes": SIZES, "batch_size": 4, "seed": 0,
        },
        optimizer=OptimizerConfig(name="adamw", args={"lr": 1e-3}),
        saving=None,
        seed=0,
        num_train_epochs=1,
        trainer=TrainerConfig(**trainer_kw),
    )


def _make_trainer(config: TrainConfig) -> Trainer:
    trainer = Trainer(config)
    trainer.register_train_dataset_class(SyntheticMultiResolutionDatasetConfig)
    trainer.register_model_class(JiTForClassToImageTraining)
    return trainer


def test_mixed_bucket_epoch_compiles_once_per_shape():
    """One epoch over 3 resolutions with accumulation=2 + EMA: exactly one
    executable per bucket shape, finite losses, EMA advanced across shape
    switches."""
    config = _train_config(
        gradient_accumulation_steps=2, use_ema=True, ema_decay=0.9,
    )
    trainer = _make_trainer(config)
    trainer.before_train()
    assert trainer.steps_per_epoch == 3 * 2  # 8 items / batch 4 per bucket

    seen_shapes = []
    orig_prepare = trainer.model.prepare_batch

    def spy_prepare(batch, key):
        arrays = orig_prepare(batch, key)
        seen_shapes.append(tuple(arrays["image"].shape))
        return arrays

    trainer.model.prepare_batch = spy_prepare
    trainer.training_loop()

    assert sorted({s[1] for s in seen_shapes}) == SIZES
    # shuffle interleaves buckets (seed 0 order is deterministic); require an
    # actual shape switch mid-epoch for the accumulation/EMA claim to bite
    assert len({s[1] for s in seen_shapes[:3]}) > 1, seen_shapes
    # one compile per bucket shape, reused across repeats of that shape
    assert trainer._pure_step._cache_size() == len(SIZES)

    # EMA advanced and is finite (boundary gating is traced, shape-agnostic)
    import jax
    from flax import nnx

    trainer.sync_module_state()
    assert trainer.ema_state is not None
    ema_leaves = [np.asarray(x) for x in jax.tree.leaves(
        nnx.state(trainer.ema_state)) if hasattr(x, "shape")]
    assert ema_leaves and all(np.isfinite(leaf).all() for leaf in ema_leaves)


def test_mixed_bucket_resume_lands_in_right_bucket(tmp_path):
    """Index-level mid-epoch resume: a fresh trainer resuming at step k gets
    exactly the batch (shape AND contents) an uninterrupted run saw at k."""
    from vision_pt_tpu.config import CheckpointingConfig

    def run(steps_cap=None, ckpt_dir="ckpt"):
        config = _train_config(
            checkpointing=CheckpointingConfig(
                save_dir=str(tmp_path / ckpt_dir), per_steps=1,
            ),
        )
        trainer = _make_trainer(config)
        trainer.before_train()
        batches = []
        orig_prepare = trainer.model.prepare_batch

        def spy(batch, key):
            arrays = orig_prepare(batch, key)
            batches.append(np.asarray(arrays["image"]))
            return arrays

        trainer.model.prepare_batch = spy
        if steps_cap is not None:
            # stop after k steps by raising through the loop
            count = {"n": 0}
            orig_step = trainer.train_step

            def capped(batch, key, at_accum_boundary=True):
                # interrupt BEFORE the (cap+1)-th step so the first cap steps
                # complete their bookkeeping (global_step++, checkpoint save)
                if count["n"] >= steps_cap:
                    raise KeyboardInterrupt
                count["n"] += 1
                return orig_step(batch, key, at_accum_boundary)

            trainer.train_step = capped
            with pytest.raises(KeyboardInterrupt):
                trainer.training_loop()
            if trainer.checkpointer is not None:
                trainer.checkpointer.wait()
        else:
            trainer.training_loop()
        return trainer, batches

    # uninterrupted epoch: record every batch (its own checkpoint dir so the
    # interrupted/resumed pair below starts from scratch)
    _, full_batches = run(ckpt_dir="ckpt_full")
    assert len(full_batches) == 6

    # interrupted at k=3 (checkpoint every step), then resume from the
    # shared dir
    _, _ = run(steps_cap=3, ckpt_dir="ckpt_resume")
    resumed_trainer, resumed_batches = run(ckpt_dir="ckpt_resume")
    # run() builds a fresh trainer that restores from the checkpoint dir;
    # it should skip the first 3 batches at the INDEX level and continue
    assert resumed_trainer.global_step >= 6
    tail = resumed_batches[: 6 - 3]
    for got, want in zip(tail, full_batches[3:]):
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want)
