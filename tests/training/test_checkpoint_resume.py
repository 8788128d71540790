"""Full train-state checkpoint/resume roundtrip."""

import json
import pytest

import jax
import numpy as np

from vision_pt_tpu.config import (
    CheckpointingConfig,
    OptimizerConfig,
    TrainConfig,
    TrainerConfig,
)
from vision_pt_tpu.data.square_class_image import SyntheticClassImageDatasetConfig
from vision_pt_tpu.training.trainer import Trainer
from vision_pt_tpu.workloads.jit_class_to_image import JiTForClassToImageTraining

TINY = dict(
    patch_size=8, hidden_size=32, depth=1, num_heads=1, bottleneck_dim=8,
    context_dim=16, context_start_block=0, rope_axes_dims=[8, 12, 12],
    num_time_tokens=2,
)


def _make_trainer(tmp_path, resume=True, epochs=1, per_steps=2, num_items=8):
    label2id_path = tmp_path / "label2id.json"
    label2id_path.write_text(json.dumps({f"c{i}": i for i in range(4)}))
    config = TrainConfig(
        model={
            "context_encoder": {"type": "class",
                                "label2id_map_path": str(label2id_path)},
            "denoiser": TINY,
            "max_token_length": 4,
            "drop_context_rate": 0.0,
        },
        dataset={},
        optimizer=OptimizerConfig(name="adamw", args={"lr": 1e-3}),
        saving=None,
        seed=0,
        num_train_epochs=epochs,
        trainer=TrainerConfig(
            use_ema=True,
            checkpointing=CheckpointingConfig(
                save_dir=str(tmp_path / "ckpt"), per_steps=per_steps,
                resume=resume,
            ),
        ),
    )
    trainer = Trainer(config)
    trainer.register_train_dataset_class(SyntheticClassImageDatasetConfig)
    config.dataset = {"num_classes": 4, "num_items": num_items,
                      "image_size": 16, "batch_size": 4}
    trainer.register_model_class(JiTForClassToImageTraining)
    trainer.before_train()
    return trainer


def _step(trainer):
    batch = next(iter(trainer.train_dataset))
    key = trainer._next_key()
    arrays = trainer.model.prepare_batch(batch, key)
    loss, _ = trainer._jit_train_step(
        trainer.model.trainable(), trainer.optimizer, arrays, key
    )
    trainer.global_step += 1
    if trainer._jit_update_ema is not None:
        trainer.ema_state = trainer._jit_update_ema(
            trainer.ema_state, trainer.model.trainable()
        )
    return float(loss)


def _record_batch_captions(trainer, into: list):
    orig = trainer.model.prepare_batch

    def recording(batch, key):
        into.append(tuple(batch["caption"]))
        return orig(batch, key)

    trainer.model.prepare_batch = recording


@pytest.mark.slow
def test_resume_at_epoch_boundary_matches_uninterrupted(tmp_path):
    """A checkpoint saved exactly at an epoch boundary (current_epoch=N,
    resumed start_epoch=N+1) must NOT replay epoch N's shuffle order:
    training_loop pins set_epoch(epoch) explicitly each epoch."""
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    # uninterrupted 2-epoch run: record the data order (4 batches/epoch)
    t1 = _make_trainer(tmp_path / "a", epochs=2, per_steps=100, num_items=16)
    seen1: list = []
    _record_batch_captions(t1, seen1)
    t1.training_loop()
    assert len(seen1) == 8
    epoch1_order = seen1[4:]

    # interrupted run: checkpoint fires at global_step 4 == end of epoch 0
    t2 = _make_trainer(tmp_path / "b", epochs=1, per_steps=4, num_items=16)
    t2.training_loop()
    assert t2.checkpointer.latest_step() == 4

    # resume into epoch 1 and record what it trains on
    t3 = _make_trainer(tmp_path / "b", epochs=2, per_steps=100, num_items=16)
    assert t3.global_step == 4
    seen3: list = []
    _record_batch_captions(t3, seen3)
    t3.training_loop()
    assert seen3 == epoch1_order


@pytest.mark.slow
def test_checkpoint_save_restore_roundtrip(tmp_path):
    t1 = _make_trainer(tmp_path)
    for _ in range(3):
        _step(t1)
    t1.save_train_state()
    assert t1.checkpointer.latest_step() == 3

    from vision_pt_tpu.utils.state_dict import flatten_state

    params_before = {
        k: np.asarray(v) for k, v in flatten_state(t1.model.trainable()).items()
    }

    # fresh trainer resumes: params, step, key counter all restored
    t2 = _make_trainer(tmp_path, resume=True)
    assert t2.global_step == 3
    assert t2._key_counter == t1._key_counter
    params_after = {
        k: np.asarray(v) for k, v in flatten_state(t2.model.trainable()).items()
    }
    for k in params_before:
        np.testing.assert_array_equal(params_before[k], params_after[k])

    # the next step is bit-identical between continued and resumed runs
    loss_continued = _step(t1)
    loss_resumed = _step(t2)
    assert loss_continued == loss_resumed

    # optimizer state restored too (adamw moments advance identically)
    pa = {k: np.asarray(v) for k, v in flatten_state(t1.model.trainable()).items()}
    pb = {k: np.asarray(v) for k, v in flatten_state(t2.model.trainable()).items()}
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], atol=1e-7)
