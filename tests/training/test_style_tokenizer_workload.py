"""Style tokenizer workload loss smoke (reference
``train/sdxl/style_tokenizer.py``): grads must flow through the frozen text
encoders into the projectors."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vision_pt_tpu.config import OptimizerConfig, TrainConfig, TrainerConfig
from vision_pt_tpu.models.sdxl.adapter.style_tokenizer import (
    TextEncoderWithStyle,
)
from vision_pt_tpu.models.sdxl.text_encoder import CLIPTextConfig, CLIPTextModel
from vision_pt_tpu.workloads.sdxl_style_tokenizer import (
    SDXLStyleTokenizerTraining,
    StyleTokenizerTrainable,
)

from tests.models.test_style_tokenizer import StyleMockTokenizer
from tests.training.test_sdxl_workload import TINY_UNET, TINY_VAE
import pytest

pytestmark = pytest.mark.slow


def test_style_tokenizer_training_loss_and_grads():
    config = TrainConfig(
        model={
            "checkpoint_path": "",
            "dtype": "float32",
            "denoiser": TINY_UNET,
            "vae_config": TINY_VAE,
            "max_token_length": 75,
            "drop_image_rate": 0.0,
            "adapter": {
                "image_encoder": {"feature_dim": 6},
                "num_style_tokens": 2,
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
    workload = SDXLStyleTokenizerTraining(config)
    workload.setup_model()

    # install tiny text encoders WITH style support, then re-add the token
    rngs = nnx.Rngs(1)
    cfg1 = CLIPTextConfig(vocab_size=1000, hidden_size=16,
                          intermediate_size=32, num_hidden_layers=2,
                          num_attention_heads=2)
    cfg2 = CLIPTextConfig(vocab_size=1000, hidden_size=24,
                          intermediate_size=48, num_hidden_layers=2,
                          num_attention_heads=2, hidden_act="gelu",
                          projection_dim=1280)
    workload.model.text_encoder = TextEncoderWithStyle(
        CLIPTextModel(cfg1, rngs=rngs), StyleMockTokenizer(),
        CLIPTextModel(cfg2, with_projection=True, rngs=rngs),
        StyleMockTokenizer(),
    )
    workload.model.setup_style_token()
    # tiny projectors matching the tiny encoders
    workload.model.manager.projectors.clear()
    workload.model.projector_1 = workload.model.manager.get_projector(
        out_features=16, rngs=nnx.Rngs(2)
    )
    workload.model.projector_2 = workload.model.manager.get_projector(
        out_features=24, rngs=nnx.Rngs(3)
    )
    from vision_pt_tpu.adapters.ip_adapter import retype_to_adapter_params

    retype_to_adapter_params(workload.model.projector_1)
    retype_to_adapter_params(workload.model.projector_2)
    workload.model.vision_encoder.set_encode_fn(
        lambda imgs: jnp.mean(imgs, axis=(1, 2)).repeat(2, axis=-1)
    )
    workload._full_trainable = StyleTokenizerTrainable(
        workload.model.denoiser,
        workload.model.projector_1,
        workload.model.projector_2,
        workload.model.text_encoder.text_encoder_1,
        workload.model.text_encoder.text_encoder_2,
        workload.model.vae,
    )

    batch = {
        "image": np.random.default_rng(0)
        .standard_normal((2, 64, 64, 3))
        .astype(np.float32)
        .clip(-1, 1),
        "caption": ["a <|style|> cat", "a <|style|> dog"],
        "original_size": np.asarray([[64.0, 64.0]] * 2),
        "target_size": np.asarray([[64.0, 64.0]] * 2),
        "crop_coords_top_left": np.asarray([[0.0, 0.0]] * 2),
    }
    key = jax.random.PRNGKey(0)
    arrays = workload.prepare_batch(batch, key)
    # the placeholder expanded to 2 style ids per caption in encoder 1
    style_id = workload.model.text_encoder.style_token_id_1
    assert int((np.asarray(arrays["ids1"]) == style_id).sum()) == 4

    loss, metrics = workload.compute_loss(
        workload._full_trainable, arrays, key
    )
    assert np.isfinite(float(loss))

    from vision_pt_tpu.peft import AdapterParam

    graphdef, adapters, rest = nnx.split(
        workload._full_trainable, AdapterParam, ...
    )

    def loss_fn(a):
        t = nnx.merge(graphdef, a, rest)
        return workload.compute_loss(t, arrays, key)[0]

    grads = jax.grad(loss_fn)(adapters)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert total > 0.0  # grads reach the projectors through the encoders

    sd = workload.get_state_dict_to_save()
    assert any(k.startswith("projector_1.") for k in sd)
    assert any(k.startswith("projector_2.") for k in sd)
