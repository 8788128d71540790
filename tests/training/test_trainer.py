import json

import numpy as np
import pytest

from vision_pt_tpu.config import (
    OptimizerConfig,
    SavingConfig,
    TrainConfig,
    TrainerConfig,
)
from vision_pt_tpu.data.square_class_image import SyntheticClassImageDatasetConfig
from vision_pt_tpu.saving import ModelSavingStrategyConfig
from vision_pt_tpu.training.trainer import Trainer
from vision_pt_tpu.workloads.jit_class_to_image import JiTForClassToImageTraining

TINY_DENOISER = dict(
    patch_size=8,
    hidden_size=64,
    depth=2,
    num_heads=2,
    bottleneck_dim=16,
    context_dim=32,
    context_start_block=0,
    rope_axes_dims=[8, 12, 12],
    num_time_tokens=2,
)


def _make_config(tmp_path, **trainer_kwargs):
    label2id_path = tmp_path / "label2id.json"
    label2id_path.write_text(json.dumps({f"c{i}": i for i in range(4)}))
    return TrainConfig(
        model={
            "context_encoder": {
                "type": "class",
                "label2id_map_path": str(label2id_path),
            },
            "denoiser": TINY_DENOISER,
            "max_token_length": 4,
            "drop_context_rate": 0.1,
        },
        dataset={},
        optimizer=OptimizerConfig(name="adamw", args={"lr": 2e-3}),
        saving=SavingConfig(
            strategy=ModelSavingStrategyConfig(per_epochs=None, per_steps=None),
            callbacks=[
                {
                    "type": "safetensors",
                    "name": "test",
                    "save_dir": str(tmp_path / "out"),
                }
            ],
        ),
        seed=0,
        num_train_epochs=2,
        trainer=TrainerConfig(**trainer_kwargs),
    )


def _run(config, tmp_path, num_items=32, image_size=16, batch_size=8):
    trainer = Trainer(config)
    trainer.register_train_dataset_class(SyntheticClassImageDatasetConfig)
    config.dataset = {
        "num_classes": 4,
        "num_items": num_items,
        "image_size": image_size,
        "batch_size": batch_size,
    }
    trainer.register_model_class(JiTForClassToImageTraining)
    trainer.before_train()
    return trainer


@pytest.mark.slow
def test_training_loss_decreases(tmp_path):
    config = _make_config(tmp_path)
    trainer = _run(config, tmp_path)

    losses = []
    trainable = trainer.model.trainable()
    for epoch in range(4):
        for batch in trainer.train_dataset:
            key = trainer._next_key()
            arrays = trainer.model.prepare_batch(batch, key)
            loss, _ = trainer._jit_train_step(
                trainable, trainer.optimizer, arrays, key
            )
            losses.append(float(loss))
    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert last < first, f"loss did not decrease: {first:.4f} -> {last:.4f}"


@pytest.mark.slow
def test_full_train_entrypoint_with_save(tmp_path):
    config = _make_config(tmp_path)
    config.num_train_epochs = 1
    trainer = Trainer(config)
    trainer.register_train_dataset_class(SyntheticClassImageDatasetConfig)
    config.dataset = {
        "num_classes": 4,
        "num_items": 16,
        "image_size": 16,
        "batch_size": 8,
    }
    trainer.register_model_class(JiTForClassToImageTraining)
    trainer.train()
    saved = list((tmp_path / "out").glob("*.safetensors"))
    assert len(saved) == 1  # save_last


def test_debug_mode_1step(tmp_path, capsys):
    config = _make_config(tmp_path, debug_mode="1step")
    trainer = _run(config, tmp_path, num_items=16, batch_size=8)
    trainer.training_loop()
    assert trainer.global_step == 1


@pytest.mark.slow
def test_gradient_accumulation_and_clip(tmp_path):
    config = _make_config(
        tmp_path, gradient_accumulation_steps=2, clip_grad_norm=1.0
    )
    trainer = _run(config, tmp_path, num_items=16, batch_size=4)
    trainable = trainer.model.trainable()
    for batch in trainer.train_dataset:
        key = trainer._next_key()
        arrays = trainer.model.prepare_batch(batch, key)
        loss, metrics = trainer._jit_train_step(
            trainable, trainer.optimizer, arrays, key
        )
        assert np.isfinite(float(loss))


def test_ema_state(tmp_path):
    config = _make_config(tmp_path, use_ema=True, ema_decay=0.9)
    trainer = _run(config, tmp_path, num_items=16, batch_size=8)
    assert trainer.ema_state is not None
    trainable = trainer.model.trainable()
    import jax

    before = jax.tree.leaves(trainer.ema_state)[0].copy()
    for batch in trainer.train_dataset:
        key = trainer._next_key()
        arrays = trainer.model.prepare_batch(batch, key)
        trainer._jit_train_step(trainable, trainer.optimizer, arrays, key)
        trainer.ema_state = trainer._jit_update_ema(trainer.ema_state, trainable)
        break
    after = jax.tree.leaves(trainer.ema_state)[0]
    assert not np.array_equal(np.asarray(before), np.asarray(after))


@pytest.mark.slow
def test_gradient_checkpointing_trains(tmp_path):
    config = _make_config(tmp_path, gradient_checkpointing=True)
    trainer = _run(config, tmp_path, num_items=8, batch_size=8)
    trainable = trainer.model.trainable()
    for batch in trainer.train_dataset:
        key = trainer._next_key()
        arrays = trainer.model.prepare_batch(batch, key)
        loss, _ = trainer._jit_train_step(
            trainable, trainer.optimizer, arrays, key
        )
        assert np.isfinite(float(loss))
        break


@pytest.mark.slow
def test_schedule_free_training_and_eval_swap(tmp_path):
    """Schedule-free optimizer trains; save uses the eval (x) params
    (reference optimizer.eval()/train() around save/preview)."""
    config = _make_config(tmp_path)
    config.optimizer = OptimizerConfig(
        name="schedulefree.RAdamScheduleFree", args={"lr": 2e-3}
    )
    config.num_train_epochs = 1
    trainer = Trainer(config)
    trainer.register_train_dataset_class(SyntheticClassImageDatasetConfig)
    config.dataset = {
        "num_classes": 4, "num_items": 16, "image_size": 16, "batch_size": 8,
    }
    trainer.register_model_class(JiTForClassToImageTraining)
    trainer.before_train()
    assert trainer._schedule_free

    from flax import nnx
    import jax.numpy as jnp

    trainable = trainer.model.trainable()
    for batch in trainer.train_dataset:
        key = trainer._next_key()
        arrays = trainer.model.prepare_batch(batch, key)
        loss, _ = trainer._jit_train_step(
            trainable, trainer.optimizer, arrays, key
        )
    assert np.isfinite(float(loss))

    def snapshot():
        # nnx.update mutates Variables in place -> copy values out
        return [
            np.asarray(v.value)
            for _, v in nnx.to_flat_state(nnx.state(trainable, trainer._wrt))
        ]

    before = snapshot()
    original = trainer._swap_in_schedule_free_eval_params()
    assert original is not None
    swapped = snapshot()
    diff = max(
        float(np.abs(a - b).max()) for a, b in zip(before, swapped)
    )
    assert diff > 0.0  # x params differ from y params after training
    nnx.update(trainable, original)
    for a, b in zip(before, snapshot()):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_ema_updates_only_on_accumulation_boundaries(tmp_path):
    """EMA tracks optimizer steps: under accumulation optax.MultiSteps only
    applies an update every k micro-steps, so EMA must advance every k too
    (reference updates EMA per applied optimizer step)."""
    config = _make_config(
        tmp_path, use_ema=True, ema_decay=0.9, gradient_accumulation_steps=2
    )
    config.num_train_epochs = 1
    config.saving = None
    trainer = _run(config, tmp_path, num_items=16, batch_size=4)  # 4 steps

    import jax

    snapshots = []
    inner = trainer.train_step

    def observing(batch, key, at_accum_boundary=True):
        out = inner(batch, key, at_accum_boundary)
        snapshots.append(
            (at_accum_boundary, np.asarray(jax.tree.leaves(trainer.ema_state)[0]))
        )
        return out

    trainer.train_step = observing
    trainer.training_loop()
    assert trainer.global_step == 4
    boundaries = [b for b, _ in snapshots]
    assert boundaries == [False, True, False, True]
    # EMA frozen on non-boundary micro-steps, moving on boundaries
    assert np.array_equal(snapshots[1][1], snapshots[2][1])  # step3 no-op
    assert not np.array_equal(snapshots[0][1], snapshots[1][1])  # step2 moved
    assert not np.array_equal(snapshots[2][1], snapshots[3][1])  # step4 moved


@pytest.mark.slow
def test_partial_epoch_resume_skips_trained_batches(tmp_path):
    """Resuming mid-epoch fast-forwards the data iterator instead of
    replaying the epoch from its start."""
    config = _make_config(tmp_path)
    config.num_train_epochs = 2
    config.saving = None
    trainer = _run(config, tmp_path, num_items=16, batch_size=4)  # 4 steps/ep
    assert trainer.steps_per_epoch == 4

    trainer.global_step = 6  # 1 full epoch + 2 steps into epoch 1

    executed = {"n": 0}
    inner = trainer.train_step

    def counting(*args, **kwargs):
        executed["n"] += 1
        return inner(*args, **kwargs)

    trainer.train_step = counting
    trainer.training_loop()
    assert executed["n"] == 2  # only the 2 remaining batches of epoch 1
    assert trainer.global_step == 8
