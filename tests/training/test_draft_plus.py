"""DRaFT+ workload test (reference ``train/sdxl/draft_plus.py`` — unfinished
upstream; ours implements the full truncated-backprop reward gradient)."""

import pytest
import jax

import jax.numpy as jnp
import numpy as np
from flax import nnx

from vision_pt_tpu.config import OptimizerConfig, TrainConfig, TrainerConfig
from vision_pt_tpu.reward import load_reward_models
from vision_pt_tpu.workloads.sdxl_draft_plus import SDXLDRaFTPlusTraining
from vision_pt_tpu.workloads.sdxl_text_to_image import SDXLTrainable

from tests.training.test_sdxl_workload import (
    TINY_UNET,
    TINY_VAE,
    _install_tiny_text_encoders,
)

pytestmark = pytest.mark.slow


def test_reward_model_loading():
    models = load_reward_models([{"type": "brightness"}])
    imgs = jnp.full((2, 8, 8, 3), 0.5)
    scores = models[0](imgs, ["a", "b"])
    np.testing.assert_allclose(np.asarray(scores), [0.5, 0.5], atol=1e-6)

    import pytest

    pick = load_reward_models([{"type": "pickscore"}])[0]
    with pytest.raises(RuntimeError, match="no network egress"):
        pick(imgs, ["a", "b"])
    pick.set_score_fn(lambda images, prompts: jnp.zeros(images.shape[0]))
    assert pick(imgs, ["a", "b"]).shape == (2,)


def test_draft_plus_loss_and_lora_grads():
    config = TrainConfig(
        model={
            "checkpoint_path": "",
            "dtype": "float32",
            "denoiser": TINY_UNET,
            "vae_config": TINY_VAE,
            "max_token_length": 75,
            "truncation_steps": 1,
            "total_steps": 3,
            "cfg_scale": 3.0,
            "sample_height": 64,
            "sample_width": 64,
            "reward_models": [{"type": "brightness"}],
            "draft_reg_weight": 1.0,
        },
        dataset={},
        peft={
            "config": {"type": "lora", "rank": 2, "dtype": "float32"},
            "include_keys": ["attn1", "attn2"],
            "exclude_keys": ["text_encoder", "vae"],
        },
        optimizer=OptimizerConfig(name="adamw", args={"lr": 1e-4}),
        saving=None,
        seed=0,
        num_train_epochs=1,
        trainer=TrainerConfig(),
    )
    workload = SDXLDRaFTPlusTraining(config)
    workload.setup_model()
    _install_tiny_text_encoders(workload.model)
    workload._full_trainable = SDXLTrainable(
        workload.model.denoiser,
        workload.model.text_encoder.text_encoder_1,
        workload.model.text_encoder.text_encoder_2,
        workload.model.vae,
    )
    # apply LoRA so the reference model (adapters disabled) differs
    from vision_pt_tpu.peft import PeftTargetConfig

    target = PeftTargetConfig.model_validate(config.peft)
    target.replace_to_peft_layer(workload._full_trainable)
    workload._set_is_peft(True)

    batch = {"caption": ["a bright photo", "a dark photo"]}
    key = jax.random.PRNGKey(0)
    arrays = workload.prepare_batch(batch, key)
    assert arrays["original_size"].shape == (4, 2)  # pos + neg

    loss, metrics = workload.compute_loss(
        workload._full_trainable, arrays, key
    )
    assert np.isfinite(float(loss))
    for name in ("reward", "reward_loss", "draft_reg_loss"):
        assert name in metrics

    from vision_pt_tpu.peft import AdapterParam

    graphdef, adapters, rest = nnx.split(
        workload._full_trainable, AdapterParam, ...
    )

    def loss_fn(a):
        t = nnx.merge(graphdef, a, rest)
        return workload.compute_loss(t, arrays, key)[0]

    grads = jax.grad(loss_fn)(adapters)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(total)
    assert total > 0.0  # reward gradients reach the LoRA params
