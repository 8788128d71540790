"""PFG workload loss smoke (reference ``train/sdxl/prompt_free.self.py``)."""

import pytest
import jax

import jax.numpy as jnp
import numpy as np

from vision_pt_tpu.config import OptimizerConfig, TrainConfig, TrainerConfig
from vision_pt_tpu.workloads.sdxl_prompt_free import SDXLPFGSelfTraining

from tests.training.test_sdxl_workload import (
    TINY_UNET,
    TINY_VAE,
    _install_tiny_text_encoders,
)

pytestmark = pytest.mark.slow


def test_pfg_self_training_loss_and_save():
    config = TrainConfig(
        model={
            "checkpoint_path": "",
            "dtype": "float32",
            "denoiser": TINY_UNET,
            "vae_config": TINY_VAE,
            "max_token_length": 75,
            "drop_image_rate": 0.1,  # rng draws are .13/.50 -> none dropped
            "timestep_sampling": "gaussian",
            "timestep_sampling_args": {"mean": 100, "std": 100},
            "adapter": {
                "image_encoder": {"feature_dim": 6},
                "num_image_tokens": 2,
                "image_size": 32,
            },
        },
        dataset={},
        optimizer=OptimizerConfig(name="adamw", args={"lr": 1e-3}),
        saving=None,
        seed=0,
        num_train_epochs=1,
        trainer=TrainerConfig(),
    )
    workload = SDXLPFGSelfTraining(config)
    workload.setup_model()
    _install_tiny_text_encoders(workload.model)
    workload.model.vision_encoder.set_encode_fn(
        lambda imgs: jnp.mean(imgs, axis=(1, 2)).repeat(2, axis=-1)
    )

    from vision_pt_tpu.workloads.sdxl_prompt_free import PFGTrainable

    workload._full_trainable = PFGTrainable(
        workload.model.denoiser,
        workload.model.projector,
        workload.model.text_encoder.text_encoder_1,
        workload.model.text_encoder.text_encoder_2,
        workload.model.vae,
    )

    batch = {
        "image": np.random.default_rng(0)
        .standard_normal((2, 64, 64, 3))
        .astype(np.float32)
        .clip(-1, 1),
        "caption": ["a cat", "a dog"],
        "original_size": np.asarray([[64.0, 64.0]] * 2),
        "target_size": np.asarray([[64.0, 64.0]] * 2),
        "crop_coords_top_left": np.asarray([[0.0, 0.0]] * 2),
    }
    key = jax.random.PRNGKey(0)
    arrays = workload.prepare_batch(batch, key)
    assert arrays["reference_pixels"].shape == (2, 32, 32, 3)

    loss, metrics = workload.compute_loss(
        workload._full_trainable, arrays, key
    )
    assert np.isfinite(float(loss))
    assert "l2_loss" in metrics

    # projector gradients flow (it's the trainable adapter)
    from flax import nnx

    from vision_pt_tpu.peft import AdapterParam

    graphdef, adapters, rest = nnx.split(
        workload._full_trainable, AdapterParam, ...
    )

    def loss_fn(a):
        t = nnx.merge(graphdef, a, rest)
        loss, _ = workload.compute_loss(t, arrays, key)
        return loss

    grads = jax.grad(loss_fn)(adapters)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert total > 0.0

    sd = workload.get_state_dict_to_save()
    assert any(k.startswith("projector.") for k in sd)
