"""PFG adapter tests (reference ``src/models/sdxl/adapter/prompt_free.py`` —
whose support module is missing upstream; this validates our working
rebuild)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vision_pt_tpu.adapters.prompt_free import (
    LinearProjector,
    MLPProjector,
    PFGConfig,
    PFGManager,
    Resampler,
)
from vision_pt_tpu.peft import AdapterParam

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("ptype", ["linear", "mlp", "resampler"])
def test_projector_shapes(ptype):
    cfg = PFGConfig(
        image_encoder={"feature_dim": 12},
        num_image_tokens=5,
        projector_type=ptype,
        projector_args={"num_heads": 4} if ptype == "resampler" else {},
    )
    manager = PFGManager(cfg)
    proj = manager.get_projector(out_features=16, rngs=nnx.Rngs(0))
    pooled = jax.random.normal(jax.random.key(0), (2, 12))
    out = proj(pooled)
    assert out.image_tokens.shape == (2, 5, 16)
    # sequence features also accepted
    seq = jax.random.normal(jax.random.key(1), (2, 9, 12))
    out2 = proj(seq)
    assert out2.image_tokens.shape == (2, 5, 16)


def test_manager_trainable_and_state_roundtrip():
    cfg = PFGConfig(image_encoder={"feature_dim": 8}, num_image_tokens=3)
    manager = PFGManager(cfg)
    proj = manager.get_projector(out_features=10, rngs=nnx.Rngs(0))
    manager.set_adapter_trainable(True)
    kinds = [type(v) for v in jax.tree.leaves(
        nnx.state(proj), is_leaf=lambda x: isinstance(x, nnx.Variable)
    )]
    assert all(issubclass(k, AdapterParam) or not issubclass(k, nnx.Param)
               for k in kinds)

    sd = manager.get_state_dict()
    assert all(k.startswith("projector.") for k in sd)
    # perturb then load back -> restored
    ref = {k: v.copy() for k, v in sd.items()}
    manager2 = PFGManager(cfg)
    manager2.get_projector(out_features=10, rngs=nnx.Rngs(7))
    manager2.load_adapter_state(ref)
    sd2 = manager2.get_state_dict()
    for k in ref:
        np.testing.assert_allclose(sd2[k], ref[k], atol=1e-6)


def test_pfg_pipeline_generate_concats_tokens():
    from tests.training.test_sdxl_workload import (
        TINY_UNET,
        TINY_VAE,
        _install_tiny_text_encoders,
    )
    from vision_pt_tpu.models.sdxl.adapter.prompt_free import (
        SDXLModelWithPFG,
        SDXLModelWithPFGConfig,
    )

    cfg = SDXLModelWithPFGConfig(
        checkpoint_path="",
        dtype="float32",
        denoiser=TINY_UNET,
        vae_config=TINY_VAE,
        adapter=PFGConfig(
            image_encoder={"feature_dim": 6}, num_image_tokens=2,
            image_size=32,
        ),
    )
    model = SDXLModelWithPFG(cfg)
    _install_tiny_text_encoders(model)
    model.vision_encoder.set_encode_fn(
        lambda imgs: jnp.mean(imgs, axis=(1, 2)).repeat(2, axis=-1)
    )

    ref = jax.random.uniform(jax.random.key(0), (1, 32, 32, 3))
    tokens = model.encode_reference_image(
        model.preprocess_reference_image(ref)
    )
    assert tokens.shape == (1, 2, TINY_UNET["context_dim"])

    imgs = model.generate(
        prompt="a cat",
        negative_prompt="",
        reference_image=ref,
        width=64,
        height=64,
        num_inference_steps=2,
        cfg_scale=3.0,
        seed=0,
        execution_dtype=jnp.float32,
    )
    assert len(imgs) == 1
    assert imgs[0].size == (64, 64)
