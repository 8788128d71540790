"""IP-Adapter framework + variants on a tiny SDXL UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vision_pt_tpu.adapters.ip_adapter import (
    IPAdapterConfig,
    IPAdapterCrossAttention,
    IPAdapterManager,
    get_ip_adapter_class,
)
from vision_pt_tpu.models.sdxl.adapter.ip_adapter import (
    SDXLModelWithIPAdapter,
    SDXLModelWithIPAdapterConfig,
)
from vision_pt_tpu.models.sdxl.config import DenoiserConfig
from vision_pt_tpu.models.sdxl.denoiser import Denoiser
from vision_pt_tpu.peft import AdapterParam

pytestmark = pytest.mark.slow

TINY_UNET = dict(
    hidden_dim=32, block_out_channels=[32, 32, 64],
    num_transformers_per_block=[1, 1, 1], num_head_channels=16,
    context_dim=40, layers_per_block=1,
)


def _unet_inputs(batch=1):
    lat = jax.random.normal(jax.random.key(0), (batch, 16, 16, 4))
    t = jnp.full((batch,), 500.0)
    ctx = jax.random.normal(jax.random.key(1), (batch, 7, 40))
    pooled = jax.random.normal(jax.random.key(2), (batch, 1280))
    sz = jnp.full((batch, 2), 128.0)
    return lat, t, ctx, pooled, sz, jnp.zeros_like(sz)


@pytest.mark.parametrize(
    "variant", ["original", "adaln_zero", "tanh_gate", "gate", "flamingo",
                "time_gate", "peft"]
)
def test_adapter_variants_apply_and_forward(variant):
    unet = Denoiser(DenoiserConfig(**TINY_UNET), rngs=nnx.Rngs(0))
    lat, t, ctx, pooled, sz, crop = _unet_inputs()
    base_out = unet(lat, t, ctx, pooled, sz, sz, crop)

    cfg = IPAdapterConfig(
        variant=variant, num_ip_tokens=4, dtype="float32",
        peft={"type": "lora", "rank": 2, "dtype": "float32"}
        if variant == "peft" else None,
        time_embedding_dim=TINY_UNET["hidden_dim"] * 4,
    )
    class Holder:  # the reference matches paths rooted at the pipeline
        pass

    holder = Holder()
    holder.denoiser = unet
    manager = IPAdapterManager(get_ip_adapter_class(variant), cfg)
    replaced = manager.apply_adapter(holder, rngs=nnx.Rngs(1))
    assert len(replaced) > 0
    assert all(p.endswith(".attn2") for p in replaced)

    ip_tokens = jax.random.normal(jax.random.key(3), (1, 4, 40))
    if variant == "adaln_zero":
        ctx_in = jnp.concatenate([ctx, ip_tokens], axis=1)
        out = unet(lat, t, ctx_in, pooled, sz, sz, crop)
    else:
        out = unet(lat, t, ctx, pooled, sz, sz, crop,
                   cross_attention_kwargs={"ip_tokens": ip_tokens})
    assert out.shape == base_out.shape
    assert bool(jnp.all(jnp.isfinite(out)))

    # gated variants start as identity (zero-init gates)
    if variant in ("tanh_gate", "gate", "flamingo", "time_gate", "adaln_zero"):
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base_out), atol=1e-4
        )

    # adapter-state roundtrip
    sd = manager.get_state_dict()
    assert any(k.endswith("to_k_ip.weight") for k in sd)
    assert all("!" in k for k in sd)  # escaped paths
    manager.load_adapter_state(sd)


def test_original_variant_initialized_from_base_weights():
    unet = Denoiser(DenoiserConfig(**TINY_UNET), rngs=nnx.Rngs(0))
    cfg = IPAdapterConfig(variant="original", dtype="float32")
    class Holder:
        pass

    holder = Holder()
    holder.denoiser = unet
    manager = IPAdapterManager(IPAdapterCrossAttention, cfg)
    manager.apply_adapter(holder, rngs=nnx.Rngs(1))
    adapter = next(iter(manager.module_dict.values()))
    np.testing.assert_array_equal(
        np.asarray(adapter.to_k_ip.value), np.asarray(adapter.to_k.kernel.value)
    )
    # ip params are AdapterParams (trainable under the PEFT wrt filter)
    assert isinstance(adapter.to_k_ip, AdapterParam)


def test_sdxl_with_ip_adapter_pipeline():
    from tests.models.test_sdxl import MockTokenizer
    from vision_pt_tpu.models.sdxl.text_encoder import (
        CLIPTextConfig,
        CLIPTextModel,
        TextEncoder,
    )

    cfg = SDXLModelWithIPAdapterConfig(
        checkpoint_path="", dtype="float32",
        denoiser=DenoiserConfig(**TINY_UNET),
        vae_config=dict(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                        norm_num_groups=4, latent_channels=4),
        adapter=IPAdapterConfig(
            variant="original", dtype="float32",
            image_encoder={"feature_dim": 24},
        ),
    )
    model = SDXLModelWithIPAdapter(cfg, rngs=nnx.Rngs(0))
    rngs = nnx.Rngs(1)
    c1 = CLIPTextConfig(vocab_size=100, hidden_size=16, intermediate_size=32,
                        num_hidden_layers=1, num_attention_heads=2)
    c2 = CLIPTextConfig(vocab_size=100, hidden_size=24, intermediate_size=48,
                        num_hidden_layers=1, num_attention_heads=2,
                        hidden_act="gelu", projection_dim=1280)
    model.text_encoder = TextEncoder(
        CLIPTextModel(c1, rngs=rngs), MockTokenizer(100),
        CLIPTextModel(c2, with_projection=True, rngs=rngs), MockTokenizer(100),
    )
    model.init_adapter()
    # fake vision tower
    model.encoder.set_encode_fn(
        lambda imgs: jnp.ones((imgs.shape[0], 24), dtype=jnp.float32)
    )
    from PIL import Image

    ref = Image.new("RGB", (30, 20), (200, 30, 40))
    ip_tokens = model.encode_reference_images([ref])
    assert ip_tokens.shape == (1, 4, 40)

    imgs = model.generate(
        "a cat", negative_prompt="bad", width=32, height=32,
        num_inference_steps=2, cfg_scale=3.0, seed=1,
        execution_dtype=jnp.float32, reference_images=[ref],
    )
    assert imgs[0].size == (32, 32)

    sd = model.adapter_state_dict()
    assert any(k.startswith("ip_adapter.") for k in sd)
    assert any(k.startswith("image_proj.") for k in sd)
