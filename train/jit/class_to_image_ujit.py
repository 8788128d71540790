"""JiT training entry point (rebuild of reference ``train/jit/class_to_image_ujit.py``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click

from vision_pt_tpu.config import TrainConfig
from vision_pt_tpu.data.preview import TextToImagePreviewConfig
from vision_pt_tpu.data.square_class_image import (
    SquareClassImageDatasetConfig,
    SyntheticClassImageDatasetConfig,
)
from vision_pt_tpu.training.trainer import Trainer
from vision_pt_tpu.workloads.jit_variants import JiTForUJiTTraining


@click.command()
@click.option("--config", "config_path", type=str, required=True)
def main(config_path: str):
    config = TrainConfig.from_config_file(config_path)
    trainer = Trainer(config)
    dataset_cfg = dict(config.dataset)
    if dataset_cfg.pop("type", None) == "synthetic":
        trainer.register_train_dataset_class(SyntheticClassImageDatasetConfig)
    else:
        trainer.register_train_dataset_class(SquareClassImageDatasetConfig)
    config.dataset = dataset_cfg
    trainer.register_preview_dataset_class(TextToImagePreviewConfig)
    trainer.register_model_class(JiTForUJiTTraining)
    trainer.train()


if __name__ == "__main__":
    main()
