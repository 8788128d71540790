"""VAE-latent caching: batched encode pass + cached-latent dataset + train
consumption (north-star deliverable; replaces the reference's in-step encode
``/root/reference/train/sdxl/text_to_image.py:92-201``)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from PIL import Image

from vision_pt_tpu.data.latent_cache import (
    CachedLatentDatasetConfig,
    cache_latents,
)
from vision_pt_tpu.data.text_to_image import TextToImageDatasetConfig
from vision_pt_tpu.models.sdxl.vae import VAE

TINY_VAE = dict(
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=1,
    norm_num_groups=4,
    latent_channels=4,
)


@pytest.fixture
def image_folder(tmp_path):
    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    sizes = [(640, 480), (480, 640), (512, 512), (640, 512)]
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"img{i}.png")
        (folder / f"img{i}.txt").write_text(f"caption {i}")
    return folder


def _build_cache(image_folder, tmp_path):
    dataset = TextToImageDatasetConfig(
        folder=str(image_folder),
        batch_size=2,
        bucket_base_size=512,
        step=64,
        min_size=256,
        shuffle=False,
    ).get_dataset()
    vae = VAE(**TINY_VAE, rngs=nnx.Rngs(0))
    cache_dir = tmp_path / "latents"
    manifest = cache_latents(dataset, vae, str(cache_dir), progress=False)
    return cache_dir, manifest, vae


def test_cache_latents_writes_manifest_and_shapes(image_folder, tmp_path):
    cache_dir, manifest, vae = _build_cache(image_folder, tmp_path)
    rows = [json.loads(l) for l in open(manifest)]
    assert len(rows) == 4
    for row in rows:
        assert row["latent_height"] == row["height"] // 8
        assert row["latent_width"] == row["width"] // 8
        assert row["scaling_factor"] == pytest.approx(float(vae.scaling_factor))
        with np.load(cache_dir / row["file"]) as z:
            assert z["mean"].shape == (
                row["latent_height"], row["latent_width"], 4
            )
            assert z["mean"].dtype == np.float16
            assert np.isfinite(z["mean"]).all()
            assert (z["std"] > 0).all()


def test_cache_latents_bfloat16_roundtrip(image_folder, tmp_path):
    """--dtype bfloat16 stores REAL bf16 (as uint16 bits + row tag), and the
    dataset loader views it back (regression: bfloat16 silently wrote fp16)."""
    import ml_dtypes

    dataset = TextToImageDatasetConfig(
        folder=str(image_folder),
        batch_size=2,
        bucket_base_size=512,
        step=64,
        min_size=256,
        shuffle=False,
    ).get_dataset()
    vae = VAE(**TINY_VAE, rngs=nnx.Rngs(0))
    cache_dir = tmp_path / "latents_bf16"
    manifest = cache_latents(dataset, vae, str(cache_dir), progress=False,
                             dtype=ml_dtypes.bfloat16)
    row = json.loads(open(manifest).readline())
    assert row["dtype"] == "bfloat16"
    with np.load(cache_dir / row["file"]) as z:
        assert z["mean"].dtype == np.uint16  # raw bf16 bits
        as_bf16 = z["mean"].view(ml_dtypes.bfloat16).astype(np.float32)
        assert np.isfinite(as_bf16).all()

    ds = CachedLatentDatasetConfig(
        cache_dir=str(cache_dir), batch_size=2, shuffle=False
    ).get_dataset()
    batch = next(iter(ds))
    assert batch["latents"].dtype == np.float32
    assert np.isfinite(batch["latents"]).all()
    assert np.abs(batch["latents"]).max() > 0


def test_cached_latent_dataset_batches_and_determinism(image_folder, tmp_path):
    cache_dir, _, _ = _build_cache(image_folder, tmp_path)
    cfg = CachedLatentDatasetConfig(
        cache_dir=str(cache_dir), batch_size=2, shuffle=True, seed=3
    )
    ds = cfg.get_dataset()
    batches = list(ds)
    assert sum(b["latents"].shape[0] for b in batches) == 4
    for b in batches:
        assert b["latents"].ndim == 4 and b["latents"].shape[-1] == 4
        assert b["latents"].dtype == np.float32
        assert all(isinstance(c, str) for c in b["caption"])
        assert b["original_size"].shape == (b["latents"].shape[0], 2)

    # same epoch -> identical sampled latents (resume reproducibility);
    # next epoch -> different latent noise draw
    ds2 = cfg.get_dataset()
    b2 = list(ds2)
    np.testing.assert_array_equal(batches[0]["latents"], b2[0]["latents"])
    b_next = list(ds2)  # epoch auto-increments after a full pass
    assert not np.array_equal(batches[0]["latents"], b_next[0]["latents"])


@pytest.mark.slow
def test_sdxl_workload_consumes_cached_latents(image_folder, tmp_path):
    """The SDXL train step skips the VAE encode when the batch carries
    cached latents."""
    from tests.training.test_sdxl_workload import (
        TINY_UNET,
        _install_tiny_text_encoders,
    )
    from vision_pt_tpu.config import OptimizerConfig, TrainConfig, TrainerConfig
    from vision_pt_tpu.workloads.sdxl_text_to_image import (
        SDXLForTextToImageTraining,
    )

    cache_dir, _, _ = _build_cache(image_folder, tmp_path)

    config = TrainConfig(
        model={
            "checkpoint_path": "",
            "denoiser": TINY_UNET,
            "vae_config": TINY_VAE,
            "dtype": "float32",
        },
        dataset={},
        optimizer=OptimizerConfig(name="adamw", args={"lr": 1e-3}),
        saving=None,
        trainer=TrainerConfig(),
    )
    model = SDXLForTextToImageTraining(config)
    model.before_setup_model()
    model.setup_model()
    _install_tiny_text_encoders(model.model)
    from vision_pt_tpu.workloads.sdxl_text_to_image import SDXLTrainable

    model._full_trainable = SDXLTrainable(
        model.model.denoiser,
        model.model.text_encoder.text_encoder_1,
        model.model.text_encoder.text_encoder_2,
        model.model.vae,
    )

    ds = CachedLatentDatasetConfig(
        cache_dir=str(cache_dir), batch_size=2, shuffle=False
    ).get_dataset()
    batch = next(iter(ds))
    key = jax.random.key(0)
    arrays = model.prepare_batch(batch, key)
    assert "latents" in arrays and "image" not in arrays

    loss, metrics = model.compute_loss(model.trainable(), arrays, key)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_jit_workload_consumes_cached_latents(image_folder, tmp_path):
    """Latent-space JiT: cached latents stand in for pixels
    (in_channels=4)."""
    from vision_pt_tpu.config import OptimizerConfig, TrainConfig, TrainerConfig
    from vision_pt_tpu.workloads.jit_class_to_image import (
        JiTForClassToImageTraining,
    )

    cache_dir, _, _ = _build_cache(image_folder, tmp_path)

    label2id = tmp_path / "label2id.json"
    label2id.write_text(json.dumps({f"caption {i}": i for i in range(5)}))
    config = TrainConfig(
        model={
            "context_encoder": {
                "type": "class", "label2id_map_path": str(label2id),
            },
            "denoiser": {
                "patch_size": 8,
                "in_channels": 4,
                "out_channels": 4,
                "hidden_size": 64,
                "depth": 2,
                "num_heads": 2,
                "bottleneck_dim": 16,
                "context_dim": 32,
                "context_start_block": 0,
                "rope_axes_dims": [8, 12, 12],
                "num_time_tokens": 2,
            },
            "max_token_length": 4,
            "drop_context_rate": 0.0,
        },
        dataset={},
        optimizer=OptimizerConfig(name="adamw", args={"lr": 1e-3}),
        saving=None,
        trainer=TrainerConfig(),
    )
    model = JiTForClassToImageTraining(config)
    model.before_setup_model()
    model.setup_model()

    ds = CachedLatentDatasetConfig(
        cache_dir=str(cache_dir), batch_size=2, shuffle=False
    ).get_dataset()
    batch = next(iter(ds))
    key = jax.random.key(0)
    arrays = model.prepare_batch(batch, key)
    assert arrays["image"].shape[-1] == 4  # latents in the image slot

    loss, _ = model.compute_loss(model.trainable(), arrays, key)
    assert np.isfinite(float(loss))
