"""Every shipped YAML config loads and validates against the workload
classes its CLI registers (mirror of the reference's ``configs/`` library —
``/root/reference/configs/sdxl/text_to_image_lora.yml`` etc.)."""

from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

from vision_pt_tpu.config import TrainConfig  # noqa: E402


def _load(rel: str) -> TrainConfig:
    return TrainConfig.from_config_file(str(REPO / rel))


def _validate_peft(config: TrainConfig):
    from vision_pt_tpu.peft import PeftTargetConfig

    raw = config.peft
    if raw is None:
        return
    for t in raw if isinstance(raw, list) else [raw]:
        PeftTargetConfig.model_validate(t)


def _validate_preview(config: TrainConfig):
    if config.preview is None:
        return
    # resolve the preview jobs file relative to the repo root, like the CLIs
    import os

    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        args = config.preview.data.get_preview_args()
    finally:
        os.chdir(cwd)
    assert len(args) > 0
    assert all(a.width > 0 and a.num_steps > 0 for a in args)


@pytest.mark.parametrize(
    "rel",
    [
        "configs/sdxl/text_to_image_lora.yml",
        "configs/sdxl/text_to_image_qlora_nf4.yml",
    ],
)
def test_sdxl_text_to_image_configs(rel):
    from vision_pt_tpu.data.text_to_image import TextToImageDatasetConfig
    from vision_pt_tpu.workloads.sdxl_text_to_image import (
        SDXLForTextToImageTrainingConfig,
    )

    config = _load(rel)
    model = SDXLForTextToImageTrainingConfig.model_validate(config.model)
    assert model.jnp_dtype is not None
    ds = TextToImageDatasetConfig.model_validate(config.dataset)
    assert ds.buckets.shape[1] == 2
    _validate_peft(config)
    _validate_preview(config)
    from vision_pt_tpu.training.optimizer import get_optimizer

    assert get_optimizer(config.optimizer.name, config.optimizer.args) is not None


def test_sdxl_flow_match_config():
    from vision_pt_tpu.data.text_to_image import TextToImageDatasetConfig
    from vision_pt_tpu.workloads.sdxl_flow_match import (
        SDXLForFlowMatchingTrainingConfig,
    )

    config = _load("configs/sdxl/flow_match/config.yml")
    model = SDXLForFlowMatchingTrainingConfig.model_validate(config.model)
    assert model.model_prediction == "velocity"
    TextToImageDatasetConfig.model_validate(config.dataset)
    _validate_peft(config)
    _validate_preview(config)


def test_jit_x_loss_config():
    from vision_pt_tpu.data.text_to_image import TextToImageDatasetConfig
    from vision_pt_tpu.workloads.jit_variants import JiTConfigForArbTraining

    config = _load("configs/jit/x_loss/config.yml")
    model = JiTConfigForArbTraining.model_validate(config.model)
    assert model.loss_target == "image"
    assert model.denoiser.hidden_size == 768
    TextToImageDatasetConfig.model_validate(config.dataset)
    _validate_preview(config)


def test_jit_latent_arb_config():
    from vision_pt_tpu.data.latent_cache import CachedLatentDatasetConfig
    from vision_pt_tpu.workloads.jit_variants import JiTConfigForArbTraining

    config = _load("configs/jit/latent_arb_1024.yml")
    model = JiTConfigForArbTraining.model_validate(config.model)
    assert model.denoiser.in_channels == 4  # latent space
    ds = CachedLatentDatasetConfig.model_validate(config.dataset)
    assert ds.cache_dir


def test_jit_synthetic_config_still_loads():
    from vision_pt_tpu.data.square_class_image import (
        SyntheticClassImageDatasetConfig,
    )
    from vision_pt_tpu.workloads.jit_class_to_image import (
        JiTConfigForTraining,
    )

    config = _load("configs/jit/synthetic_class_to_image.yml")
    JiTConfigForTraining.model_validate(
        {**config.model, "context_encoder": {
            "type": "class", "label2id_map_path": __file__,
        }}
    )
    SyntheticClassImageDatasetConfig.model_validate(
        {k: v for k, v in config.dataset.items() if k != "type"}
    )
