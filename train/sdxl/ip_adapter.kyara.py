"""SDXL IP-Adapter (kyara) training entry point (rebuild of reference
``train/sdxl/ip_adapter.kyara.py``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click

from vision_pt_tpu.config import TrainConfig
from vision_pt_tpu.data.preview import TextToImagePreviewConfig
from vision_pt_tpu.data.referenced_text_to_image import ReferencedTextToImageDatasetConfig
from vision_pt_tpu.training.trainer import Trainer
from vision_pt_tpu.workloads.sdxl_ip_adapter import SDXLIPAdapterKyaraTraining


@click.command()
@click.option("--config", "config_path", type=str, required=True)
def main(config_path: str):
    config = TrainConfig.from_config_file(config_path)
    trainer = Trainer(config)
    trainer.register_train_dataset_class(ReferencedTextToImageDatasetConfig)
    trainer.register_preview_dataset_class(TextToImagePreviewConfig)
    trainer.register_model_class(SDXLIPAdapterKyaraTraining)
    trainer.train()


if __name__ == "__main__":
    main()
