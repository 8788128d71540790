"""JiT training on cached VAE latents (north-star driver config #2/#5:
ARB + cached latents — the latent-space counterpart of
``train/jit/arb_class_to_image.py``; build the cache first with
``tools/data/cache_latents.py``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click

from vision_pt_tpu.config import TrainConfig
from vision_pt_tpu.data.latent_cache import CachedLatentDatasetConfig
from vision_pt_tpu.data.preview import TextToImagePreviewConfig
from vision_pt_tpu.training.trainer import Trainer
from vision_pt_tpu.workloads.jit_variants import JiTForArbClassToImageTraining


@click.command()
@click.option("--config", "config_path", type=str, required=True)
def main(config_path: str):
    config = TrainConfig.from_config_file(config_path)
    trainer = Trainer(config)
    trainer.register_train_dataset_class(CachedLatentDatasetConfig)
    trainer.register_preview_dataset_class(TextToImagePreviewConfig)
    trainer.register_model_class(JiTForArbClassToImageTraining)
    trainer.train()


if __name__ == "__main__":
    main()
