"""Artifact-gated real-weight SDXL integration tests (VERDICT r3 #7).

Mirror of reference ``tests/models/test_sdxl.py:154-257``
(test_load_illustrious_xl / test_generate_illustrious_xl), which download a
real checkpoint from HF. This box has zero egress, so these are gated on a
local checkpoint instead: set ``VISION_PT_SDXL_CHECKPOINT=/path/to/model.safetensors``
(or drop a single-file SDXL checkpoint under ``./models/``) and they run;
otherwise they skip cleanly. One-command equivalent outside pytest:
``scripts/inference/import_sdxl.sh <checkpoint>``.
"""

import glob
import os

import numpy as np
import pytest


def _find_checkpoint() -> str | None:
    env = os.environ.get("VISION_PT_SDXL_CHECKPOINT")
    if env and os.path.exists(env):
        return env
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    hits = sorted(glob.glob(os.path.join(repo_root, "models", "*.safetensors")))
    return hits[0] if hits else None


_CKPT = _find_checkpoint()
needs_weights = pytest.mark.skipif(
    _CKPT is None,
    reason="no real SDXL checkpoint: set VISION_PT_SDXL_CHECKPOINT or put a "
           ".safetensors under ./models/",
)


@needs_weights
@pytest.mark.slow
def test_load_real_sdxl_strict_and_forward():
    """Reference ``test_load_illustrious_xl``: strict load through the key
    converters, then a full-latent-shape denoiser forward."""
    import jax
    import jax.numpy as jnp

    from vision_pt_tpu.models.sdxl import SDXLConfig, SDXLModel

    model = SDXLModel.from_checkpoint(SDXLConfig(checkpoint_path=_CKPT))

    lat = jax.random.normal(jax.random.key(0), (1, 128, 128, 4),
                            dtype=jnp.bfloat16)
    ehs = jax.random.normal(jax.random.key(1), (1, 77, 2048),
                            dtype=jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(2), (1, 1280),
                               dtype=jnp.bfloat16)
    sizes = jnp.asarray([[1024.0, 1024.0]], dtype=jnp.float32)
    crop = jnp.zeros((1, 2), dtype=jnp.float32)
    out = model.denoiser(lat, jnp.asarray([500.0]), ehs, pooled,
                         sizes, sizes, crop)
    assert out.shape == lat.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


@needs_weights
@pytest.mark.slow
def test_generate_real_sdxl():
    """Reference ``test_generate_illustrious_xl``: end-to-end generate on real
    weights; asserts a non-degenerate image (finite, non-constant)."""
    from vision_pt_tpu.models.sdxl import SDXLConfig, SDXLModel

    model = SDXLModel.from_checkpoint(SDXLConfig(checkpoint_path=_CKPT))
    images = model.generate(
        prompt="1girl, solo, masterpiece, best quality",
        negative_prompt="worst quality, low quality",
        width=768, height=768, num_inference_steps=8,
        cfg_scale=5.0, seed=42,
    )
    arr = np.asarray(images[0], dtype=np.float32)
    assert np.isfinite(arr).all()
    assert arr.std() > 5.0, f"degenerate image (std={arr.std():.2f})"
