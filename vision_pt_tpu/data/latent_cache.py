"""Offline VAE-latent caching: batched TPU encode pass + cached-latent
dataset.

The reference encodes latents inside every train step
(``/root/reference/train/sdxl/text_to_image.py:92-201``) — the VAE forward
burns step time and HBM for an input that never changes. Here the encode is
a one-time batched TPU pass over the aspect-ratio-bucketed dataset; training
then streams latents from disk and the step starts at the denoiser.

Cache layout under ``cache_dir``:
- ``manifest.jsonl``: one row per item — latent file, latent shape, caption,
  SDXL size conditioning, the VAE scaling factor used.
- ``<sha1>.npz``: ``mean``/``std`` of the latent distribution (fp16 by
  default; bfloat16 is stored as raw uint16 bits + a ``dtype`` row tag).
  Storing the distribution (not one draw) keeps the reference's per-step
  latent sampling: training draws ``mean + std * eps`` with the bucket's
  deterministic per-(seed, epoch, idx) RNG, so latent noise still varies
  across epochs and reproduces across checkpoint resume.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any

import numpy as np
from pydantic import BaseModel

from .bucket import Bucket, ConcatBucketDataset
from .caption import CaptionProcessorList, apply_caption_processors

MANIFEST_NAME = "manifest.jsonl"


def _item_key(row: dict) -> str:
    raw = f"{row.get('image', row.get('caption', ''))}|{row['width']}x{row['height']}"
    return hashlib.sha1(raw.encode()).hexdigest()


def cache_latents(
    dataset: ConcatBucketDataset,
    vae,
    cache_dir: str,
    dtype=np.float16,
    progress: bool = True,
) -> str:
    """Batched TPU VAE encode pass: one jit-compiled encode per bucket shape
    (ARB gives a finite shape set), latents written item-by-item.

    ``dataset`` must yield batches with ``image`` (NHWC, [-1, 1]) plus
    caption/size fields (the text_to_image layout). Returns the manifest
    path.
    """
    import jax
    import jax.numpy as jnp
    from flax import nnx

    out_dir = Path(cache_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest_path = out_dir / MANIFEST_NAME

    @nnx.jit
    def encode(vae, images):
        dist = vae.encode(images)
        std = jnp.exp(0.5 * jnp.clip(dist.logvar, -30.0, 20.0))
        return dist.mean, std

    n_items = 0
    iterator = iter(dataset)
    if progress:
        from tqdm import tqdm

        iterator = tqdm(iterator, total=len(dataset), desc="cache_latents")

    with open(manifest_path, "w") as mf:
        for batch in iterator:
            images = batch["image"]
            if images.ndim == 4 and images.shape[-1] != 3 and images.shape[1] == 3:
                images = np.moveaxis(images, 1, -1)
            mean, std = encode(vae, jnp.asarray(images, dtype=jnp.float32))
            mean = np.asarray(mean, dtype=dtype)
            std = np.asarray(std, dtype=dtype)
            # npz cannot round-trip the ml_dtypes bfloat16 extension dtype:
            # store the raw bits as uint16 and tag the row so the loader
            # views them back
            stored_dtype = str(mean.dtype)
            if stored_dtype == "bfloat16":
                mean = mean.view(np.uint16)
                std = std.view(np.uint16)
            bsz = mean.shape[0]
            for i in range(bsz):
                row = {
                    "caption": batch["caption"][i],
                    "height": int(images.shape[1]),
                    "width": int(images.shape[2]),
                    "original_size": np.asarray(
                        batch["original_size"][i]
                    ).tolist(),
                    "target_size": np.asarray(batch["target_size"][i]).tolist(),
                    "crop_coords_top_left": np.asarray(
                        batch["crop_coords_top_left"][i]
                    ).tolist(),
                    "scaling_factor": float(vae.scaling_factor),
                    "dtype": stored_dtype,
                }
                key = hashlib.sha1(
                    json.dumps(row, sort_keys=True).encode()
                    + mean[i].tobytes()[:256]
                ).hexdigest()
                fname = f"{key}.npz"
                np.savez(out_dir / fname, mean=mean[i], std=std[i])
                row["file"] = fname
                row["latent_height"] = int(mean.shape[1])
                row["latent_width"] = int(mean.shape[2])
                mf.write(json.dumps(row) + "\n")
                n_items += 1
    if progress:
        print(f"[latent_cache] wrote {n_items} latents to {out_dir}")
    return str(manifest_path)


class CachedLatentBucket(Bucket):
    """Serves pre-encoded latents. Batch fields: ``latents`` (scaled,
    sampled), caption + SDXL size conditioning."""

    def __init__(self, rows: list[dict], cache_dir: str, batch_size: int,
                 num_repeats: int = 1, sample: bool = True, seed: int = 0,
                 caption_processors: CaptionProcessorList = ()):
        super().__init__(rows, batch_size, num_repeats)
        self.cache_dir = Path(cache_dir)
        self.sample = sample
        self.seed = seed
        self.caption_processors = list(caption_processors)

    def load_item(self, idx: int) -> dict:
        row = self.get_item(idx)
        rng = self.item_rng(idx, self.seed)
        with np.load(self.cache_dir / row["file"]) as z:
            mean, std = z["mean"], z["std"]
            if row.get("dtype") == "bfloat16":  # stored as raw uint16 bits
                import ml_dtypes

                mean = mean.view(ml_dtypes.bfloat16)
                std = std.view(ml_dtypes.bfloat16)
            mean = mean.astype(np.float32)
            std = std.astype(np.float32)
        if self.sample:
            latent = mean + std * rng.standard_normal(mean.shape).astype(
                np.float32
            )
        else:
            latent = mean
        latent = latent * row.get("scaling_factor", 1.0)
        caption = apply_caption_processors(
            row["caption"], self.caption_processors, rng
        )
        return {
            "latents": latent,
            "caption": caption,
            "original_size": np.asarray(row["original_size"], dtype=np.int32),
            "target_size": np.asarray(row["target_size"], dtype=np.int32),
            "crop_coords_top_left": np.asarray(
                row["crop_coords_top_left"], dtype=np.int32
            ),
        }


class CachedLatentDatasetConfig(BaseModel):
    """Dataset mode over a latent cache directory (driver configs #2/#5:
    'ARB + cached VAE latents'). Buckets re-form by latent shape, so the
    train loop still sees one compiled step per resolution."""

    cache_dir: str
    batch_size: int = 32
    num_repeats: int = 1
    shuffle: bool = True
    num_workers: int = 8
    sample_latents: bool = True  # draw mean + std*eps per epoch vs mean only
    caption_processors: CaptionProcessorList = []
    seed: int = 0

    def get_dataset(self) -> ConcatBucketDataset:
        manifest = Path(self.cache_dir) / MANIFEST_NAME
        rows_by_shape: dict[tuple[int, int], list[dict]] = {}
        with open(manifest) as f:
            for line in f:
                row = json.loads(line)
                shape = (row["latent_height"], row["latent_width"])
                rows_by_shape.setdefault(shape, []).append(row)

        buckets = []
        for shape in sorted(rows_by_shape):
            bucket = CachedLatentBucket(
                rows_by_shape[shape],
                cache_dir=self.cache_dir,
                batch_size=self.batch_size,
                num_repeats=self.num_repeats,
                sample=self.sample_latents,
                seed=self.seed,
                caption_processors=self.caption_processors,
            )
            bucket.load_workers = max(1, self.num_workers)
            buckets.append(bucket)
        if not buckets:
            raise ValueError(f"empty latent cache at {self.cache_dir}")
        return ConcatBucketDataset(buckets, shuffle=self.shuffle,
                                   seed=self.seed)
