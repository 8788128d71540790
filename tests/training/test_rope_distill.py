"""RoPE-distill workload loss smoke test (reference
``train/sdxl/rope_distill.py``): all four losses on the tiny pipeline."""

import pytest
import jax

import numpy as np

from vision_pt_tpu.config import OptimizerConfig, TrainConfig, TrainerConfig
from vision_pt_tpu.workloads.sdxl_rope_distill import SDXLRoPEDistillTraining

from tests.training.test_sdxl_workload import (
    TINY_UNET,
    TINY_VAE,
    _install_tiny_text_encoders,
)

pytestmark = pytest.mark.slow


def test_rope_distill_compute_loss():
    config = TrainConfig(
        model={
            "checkpoint_path": "",
            "dtype": "float32",
            "denoiser": dict(TINY_UNET, rope_dims=[8, 8], rope_enabled=True),
            "vae_config": TINY_VAE,
            "max_token_length": 75,
            "l2_loss_weight": 1.0,
            "distill_loss_weight": 1.0,
            "lowres_l2_loss_weight": 0.5,
            "lowres_distill_loss_weight": 1.0,
            "lowres_ratio": 2.0,
        },
        dataset={},
        optimizer=OptimizerConfig(name="adamw", args={"lr": 1e-3}),
        saving=None,
        seed=0,
        num_train_epochs=1,
        trainer=TrainerConfig(),
    )
    workload = SDXLRoPEDistillTraining(config)
    workload.setup_model()
    _install_tiny_text_encoders(workload.model)

    from vision_pt_tpu.workloads.sdxl_text_to_image import SDXLTrainable

    workload._full_trainable = SDXLTrainable(
        workload.model.denoiser,
        workload.model.text_encoder.text_encoder_1,
        workload.model.text_encoder.text_encoder_2,
        workload.model.vae,
    )

    batch = {
        "image": np.random.default_rng(0)
        .standard_normal((2, 64, 64, 3))
        .astype(np.float32),
        "caption": ["a cat", "a dog"],
        "original_size": np.asarray([[64.0, 64.0]] * 2),
        "target_size": np.asarray([[64.0, 64.0]] * 2),
        "crop_coords_top_left": np.asarray([[0.0, 0.0]] * 2),
    }
    key = jax.random.PRNGKey(0)
    arrays = workload.prepare_batch(batch, key)
    loss, metrics = workload.compute_loss(
        workload._full_trainable, arrays, key
    )
    assert np.isfinite(float(loss))
    for name in ("l2_loss", "distill_loss", "lowres_l2_loss",
                 "lowres_distill_loss"):
        assert name in metrics, name
        assert np.isfinite(float(metrics[name]))
    # student runs with RoPE restored after the teacher passes
    assert workload.model.denoiser.rope_enabled


def test_rope_distill_grads_exclude_teacher():
    """Distill loss must not leak grads through the teacher pass."""
    import jax.numpy as jnp
    from flax import nnx

    config = TrainConfig(
        model={
            "checkpoint_path": "",
            "dtype": "float32",
            "denoiser": dict(TINY_UNET, rope_dims=[8, 8], rope_enabled=True),
            "vae_config": TINY_VAE,
            "max_token_length": 75,
            "l2_loss_weight": 0.0,
            "distill_loss_weight": 1.0,
            "lowres_l2_loss_weight": 0.0,
            "lowres_distill_loss_weight": 0.0,
        },
        dataset={},
        optimizer=OptimizerConfig(name="adamw", args={"lr": 1e-3}),
        saving=None,
        seed=0,
        num_train_epochs=1,
        trainer=TrainerConfig(),
    )
    workload = SDXLRoPEDistillTraining(config)
    workload.setup_model()
    _install_tiny_text_encoders(workload.model)

    denoiser = workload.model.denoiser
    key = jax.random.PRNGKey(1)
    batch = {
        "image": np.zeros((1, 64, 64, 3), dtype=np.float32),
        "caption": ["x"],
        "original_size": np.asarray([[64.0, 64.0]]),
        "target_size": np.asarray([[64.0, 64.0]]),
        "crop_coords_top_left": np.asarray([[0.0, 0.0]]),
    }
    arrays = workload.prepare_batch(batch, key)

    graphdef, params, rest = nnx.split(denoiser, nnx.Param, ...)

    def loss_fn(p):
        d = nnx.merge(graphdef, p, rest)
        loss, _ = workload.compute_loss(d, arrays, key)
        return loss

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert np.isfinite(total)
    assert total > 0.0  # student side produces grads
