"""End-to-end SDXL LoRA training on tiny models + synthetic image folder."""

import numpy as np
import pytest
from PIL import Image

from vision_pt_tpu.config import OptimizerConfig, TrainConfig, TrainerConfig
from vision_pt_tpu.data.text_to_image import TextToImageDatasetConfig
from vision_pt_tpu.models.sdxl.text_encoder import (
    CLIPTextConfig,
    CLIPTextModel,
    TextEncoder,
)
from vision_pt_tpu.training.trainer import Trainer
from vision_pt_tpu.workloads.sdxl_text_to_image import SDXLForTextToImageTraining

from tests.models.test_sdxl import MockTokenizer

pytestmark = pytest.mark.slow

TINY_UNET = dict(
    hidden_dim=32,
    block_out_channels=[32, 32, 64],
    num_transformers_per_block=[1, 1, 1],
    num_head_channels=16,
    context_dim=40,
    layers_per_block=1,
)
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
    for i in range(4):
        arr = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"img{i}.png")
        (folder / f"img{i}.txt").write_text(f"a photo number {i}")
    return folder


def _install_tiny_text_encoders(model):
    from flax import nnx

    rngs = nnx.Rngs(1)
    cfg1 = CLIPTextConfig(vocab_size=1000, hidden_size=16, intermediate_size=32,
                          num_hidden_layers=2, num_attention_heads=2)
    cfg2 = CLIPTextConfig(vocab_size=1000, hidden_size=24, intermediate_size=48,
                          num_hidden_layers=2, num_attention_heads=2,
                          hidden_act="gelu", projection_dim=1280)
    model.text_encoder = TextEncoder(
        CLIPTextModel(cfg1, rngs=rngs), MockTokenizer(),
        CLIPTextModel(cfg2, with_projection=True, rngs=rngs), MockTokenizer(),
    )


def test_sdxl_lora_training_step(tmp_path, image_folder):
    config = TrainConfig(
        model={
            "checkpoint_path": "",
            "dtype": "float32",
            "denoiser": TINY_UNET,
            "vae_config": TINY_VAE,
            "max_token_length": 75,
        },
        dataset={},
        peft={
            "config": {"type": "lora", "rank": 2, "dtype": "float32"},
            "include_keys": ["attn1", "attn2", ".ff."],
            "exclude_keys": ["text_encoder", "vae"],
        },
        optimizer=OptimizerConfig(name="adamw", args={"lr": 1e-3}),
        saving=None,
        seed=0,
        num_train_epochs=1,
        trainer=TrainerConfig(),
    )
    trainer = Trainer(config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    config.dataset = {
        "folder": str(image_folder),
        "batch_size": 2,
        "bucket_base_size": 64,
        "step": 32,
        "min_size": 32,
        "num_workers": 2,
    }

    # patch model setup to install tiny text encoders before peft
    orig_setup = SDXLForTextToImageTraining.setup_model

    def setup_with_tiny_te(self):
        orig_setup(self)
        _install_tiny_text_encoders(self.model)
        # rebuild trainable tree with the tiny encoders
        from vision_pt_tpu.workloads.sdxl_text_to_image import SDXLTrainable

        self._full_trainable = SDXLTrainable(
            self.model.denoiser,
            self.model.text_encoder.text_encoder_1,
            self.model.text_encoder.text_encoder_2,
            self.model.vae,
        )

    SDXLForTextToImageTraining.setup_model = setup_with_tiny_te
    try:
        trainer.register_model_class(SDXLForTextToImageTraining)
        trainer.before_train()
    finally:
        SDXLForTextToImageTraining.setup_model = orig_setup

    # lora layers replaced only inside the denoiser attn/ff
    from vision_pt_tpu.peft import LoRALinear, iter_named_modules

    lora_paths = [
        p for p, m in iter_named_modules(trainer.model.trainable())
        if isinstance(m, LoRALinear)
    ]
    assert lora_paths, "no LoRA layers were injected"
    assert all(p.startswith("denoiser.") for p in lora_paths)

    trainable = trainer.model.trainable()
    losses = []
    for batch in trainer.train_dataset:
        key = trainer._next_key()
        arrays = trainer.model.prepare_batch(batch, key)
        loss, _ = trainer._jit_train_step(trainable, trainer.optimizer, arrays, key)
        losses.append(float(loss))
    assert all(np.isfinite(losses))

    # adapter-only save in comfy key layout
    sd = trainer.model.get_state_dict_to_save()
    assert all("lora" in k or k.endswith("alpha") for k in sd)
    assert any(k.startswith("diffusion_model.") for k in sd)


def test_qlora_module_tree_surgery_and_step():
    """Driver config #4 path at module level: NF4-quantize the UNet's
    attention/ff linears, LoRA on top, grads flow to adapters only and the
    quantized base stays fixed."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from vision_pt_tpu.models.sdxl.config import DenoiserConfig
    from vision_pt_tpu.models.sdxl.denoiser import Denoiser
    from vision_pt_tpu.ops.quant import quantize_inplace
    from vision_pt_tpu.ops.quant.layers import QuantLinear4bit
    from vision_pt_tpu.peft import AdapterParam, LoRAConfig
    from vision_pt_tpu.peft.functional import (
        iter_named_modules,
        replace_to_peft_layer,
    )

    unet = Denoiser(DenoiserConfig(**TINY_UNET), rngs=nnx.Rngs(0))
    n_quant = len(
        quantize_inplace(unet, "bnb_nf4", include_keys=["attn1", "attn2", ".ff."])
    )
    assert n_quant > 0
    replaced = replace_to_peft_layer(
        unet, ["attn1", "attn2"], [],
        LoRAConfig(type="lora", rank=2, dtype="float32"), seed=0,
    )
    assert replaced, "LoRA did not wrap any quantized linear"
    # at least one LoRA wraps a QuantLinear4bit base
    assert any(
        m.__class__.__name__ == "LoRALinear"
        and isinstance(getattr(m, "linear", None), QuantLinear4bit)
        for _, m in iter_named_modules(unet)
    )

    opt = nnx.Optimizer(unet, optax.adamw(1e-3), wrt=AdapterParam)
    lat = jax.random.normal(jax.random.key(0), (2, 16, 16, 4))
    t = jnp.asarray([10.0, 500.0])
    ctx = jax.random.normal(jax.random.key(1), (2, 7, TINY_UNET["context_dim"]))
    pooled = jax.random.normal(jax.random.key(2), (2, 1280))
    sz = jnp.full((2, 2), 128.0)

    def snap_packed():
        return {
            path: np.asarray(m.packed.value).copy()
            for path, m in iter_named_modules(unet)
            if isinstance(m, QuantLinear4bit)
        }

    packed_before = snap_packed()

    @nnx.jit
    def step(unet, opt):
        def loss_fn(m):
            out = m(lat, t, ctx, pooled, sz, sz, jnp.zeros_like(sz))
            return jnp.mean(jnp.square(out))

        loss, grads = nnx.value_and_grad(
            loss_fn, argnums=nnx.DiffState(0, AdapterParam)
        )(unet)
        opt.update(unet, grads)
        return loss

    l0 = float(step(unet, opt))
    l1 = float(step(unet, opt))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 != l0  # adapters actually moved

    packed_after = snap_packed()
    assert set(packed_before) == set(packed_after)
    for key in packed_before:
        np.testing.assert_array_equal(
            packed_before[key], packed_after[key]
        )  # base never updates
