"""Batched TPU VAE-latent caching pass (north-star deliverable; replaces the
reference's in-step VAE encode, ``/root/reference/train/sdxl/text_to_image.py:92-201``).

Walks an aspect-ratio-bucketed image folder, encodes every bucket batch on
the TPU (one compile per bucket shape), and writes a latent cache that
``CachedLatentDatasetConfig`` serves at train time.

    python tools/data/cache_latents.py \
        --folder data/images --cache-dir cache/latents_1024 \
        --bucket-base-size 1024 --checkpoint models/sdxl.safetensors

Without --checkpoint / --vae-config the SDXL VAE architecture is used with
random weights (only useful for pipeline smoke tests).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click


@click.command()
@click.option("--folder", type=str, required=True)
@click.option("--cache-dir", type=str, required=True)
@click.option("--checkpoint", type=str, default=None,
              help="SDXL single-file checkpoint to pull VAE weights from")
@click.option("--vae-config", type=str, default=None,
              help="JSON dict overriding the VAE architecture")
@click.option("--bucket-base-size", type=int, default=1024)
@click.option("--step", type=int, default=64)
@click.option("--min-size", type=int, default=384)
@click.option("--batch-size", type=int, default=8)
@click.option("--num-workers", type=int, default=8)
@click.option("--dtype", type=click.Choice(["float16", "bfloat16"]),
              default="float16", help="storage dtype for cached latents")
def main(folder, cache_dir, checkpoint, vae_config, bucket_base_size, step,
         min_size, batch_size, num_workers, dtype):
    import numpy as np
    from flax import nnx

    from vision_pt_tpu.data.latent_cache import cache_latents
    from vision_pt_tpu.data.text_to_image import TextToImageDatasetConfig
    from vision_pt_tpu.models.sdxl.vae import VAE

    dataset = TextToImageDatasetConfig(
        folder=folder,
        batch_size=batch_size,
        num_workers=num_workers,
        bucket_base_size=bucket_base_size,
        step=step,
        min_size=min_size,
        shuffle=False,
        num_repeats=1,
    ).get_dataset()

    if vae_config:
        vae = VAE(**json.loads(vae_config), rngs=nnx.Rngs(0))
    else:
        vae = VAE.from_default(rngs=nnx.Rngs(0))
    if checkpoint:
        from vision_pt_tpu.models.sdxl.convert import convert_from_original_key
        from vision_pt_tpu.models.sdxl.pipeline import (
            _fix_vae_attention_projections,
        )
        from vision_pt_tpu.utils.state_dict import load_flat_state

        from safetensors.numpy import load_file

        sd = load_file(checkpoint)
        sd = {convert_from_original_key(k): v for k, v in sd.items()}
        vae_sd = _fix_vae_attention_projections(
            {k.removeprefix("vae."): v for k, v in sd.items()
             if k.startswith("vae.")}
        )
        load_flat_state(vae, vae_sd, strict=True)
        print(f"[cache_latents] VAE weights from {checkpoint}")

    if dtype == "bfloat16":
        import ml_dtypes

        np_dtype = ml_dtypes.bfloat16
    else:
        np_dtype = np.float16
    manifest = cache_latents(dataset, vae, cache_dir, dtype=np_dtype)
    print(f"[cache_latents] manifest: {manifest}")


if __name__ == "__main__":
    main()
