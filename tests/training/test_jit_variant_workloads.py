"""One train step per JiT variant workload on synthetic data."""

import json

import numpy as np
import pytest

from vision_pt_tpu.config import OptimizerConfig, TrainConfig, TrainerConfig
from vision_pt_tpu.data.square_class_image import SyntheticClassImageDatasetConfig
from vision_pt_tpu.training.trainer import Trainer
from vision_pt_tpu.workloads import jit_variants

pytestmark = pytest.mark.slow

TINY = dict(
    patch_size=8, hidden_size=64, depth=4, num_heads=2, bottleneck_dim=16,
    context_dim=32, context_start_block=1, rope_axes_dims=[8, 12, 12],
    num_time_tokens=2,
)


@pytest.mark.parametrize(
    "workload_name,extra",
    [
        ("JiTForArbClassToImageTraining", {"lowres_loss": [0.5]}),
        ("JiTForUJiTTraining", {"denoiser_extra": {"depth": 1, "num_blocks": 4}}),
        ("JiTForCrossTraining", {}),
        ("JiTForIGTraining", {"denoiser_extra": {"intermediate_output_idx": 1}}),
        ("JiTForLoIGTraining", {"denoiser_extra": {"internal_rank": 4}}),
        (
            "JiTForTreadTraining",
            {"denoiser_extra": {"tread_route_rate": 0.5,
                                "tread_start_block": 1, "tread_end_block": 3}},
        ),
    ],
)
def test_variant_one_step(tmp_path, workload_name, extra):
    workload_class = getattr(jit_variants, workload_name)
    label2id_path = tmp_path / "label2id.json"
    label2id_path.write_text(json.dumps({f"c{i}": i for i in range(4)}))
    denoiser = {**TINY, **extra.get("denoiser_extra", {})}
    model_cfg = {
        "context_encoder": {"type": "class",
                            "label2id_map_path": str(label2id_path)},
        "denoiser": denoiser,
        "max_token_length": 4,
        "drop_context_rate": 0.0,
    }
    if "lowres_loss" in extra:
        model_cfg["lowres_loss"] = extra["lowres_loss"]
    config = TrainConfig(
        model=model_cfg,
        dataset={},
        optimizer=OptimizerConfig(name="adamw", args={"lr": 1e-3}),
        saving=None,
        seed=0,
        num_train_epochs=1,
        trainer=TrainerConfig(),
    )
    trainer = Trainer(config)
    trainer.register_train_dataset_class(SyntheticClassImageDatasetConfig)
    config.dataset = {
        "num_classes": 4, "num_items": 8, "image_size": 16, "batch_size": 4,
    }
    trainer.register_model_class(workload_class)
    trainer.before_train()
    trainable = trainer.model.trainable()
    batch = next(iter(trainer.train_dataset))
    key = trainer._next_key()
    arrays = trainer.model.prepare_batch(batch, key)
    loss, metrics = trainer._jit_train_step(trainable, trainer.optimizer, arrays, key)
    assert np.isfinite(float(loss)), workload_name
