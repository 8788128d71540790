"""JAX CLIP vision tower tests (HF CLIPVisionModel analog; used by
AutoImageEncoder for IP-Adapter/PFG/style towers)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vision_pt_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionModel,
    convert_hf_clip_vision,
)

TINY = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=2, image_size=28, patch_size=14,
    projection_dim=16,
)


def test_shapes_and_hidden_states():
    model = CLIPVisionModel(CLIPVisionConfig(**TINY), with_projection=True,
                            rngs=nnx.Rngs(0))
    pixels = jax.random.normal(jax.random.key(0), (2, 28, 28, 3))
    out = model(pixels)
    assert out.last_hidden_state.shape == (2, 5, 32)  # 4 patches + cls
    assert out.pooler_output.shape == (2, 32)
    assert out.image_embeds.shape == (2, 16)
    assert len(out.hidden_states) == 3  # embeddings + 2 layers


@pytest.mark.slow
def test_parity_with_hf_clip_vision():
    transformers = pytest.importorskip("transformers")
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModel as HFModel

    hf_cfg = HFConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="quick_gelu",
    )
    tmodel = HFModel(hf_cfg)
    tmodel.eval()

    jmodel = CLIPVisionModel(
        CLIPVisionConfig(**TINY, hidden_act="quick_gelu"), rngs=nnx.Rngs(0)
    )
    from vision_pt_tpu.utils.state_dict import load_flat_state

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    load_flat_state(jmodel, convert_hf_clip_vision(sd), strict=False)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(pixels), output_hidden_states=True)

    from vision_pt_tpu.ops.attention import (
        get_default_attention_dtype,
        set_default_attention_dtype,
    )

    _prev_attn_dtype = get_default_attention_dtype()
    set_default_attention_dtype(None)
    try:
        out = jmodel(jnp.asarray(pixels.transpose(0, 2, 3, 1)))
    finally:
        set_default_attention_dtype(_prev_attn_dtype)

    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state),
        ref.last_hidden_state.numpy(), atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.pooler_output), ref.pooler_output.numpy(), atol=2e-5,
    )
    for mine, theirs in zip(out.hidden_states, ref.hidden_states):
        np.testing.assert_allclose(
            np.asarray(mine), theirs.numpy(), atol=2e-5
        )


def test_auto_image_encoder_from_local(tmp_path):
    from safetensors.numpy import save_file

    from vision_pt_tpu.adapters.ip_adapter import ImageEncoderConfig
    from vision_pt_tpu.models.auto import AutoImageEncoder

    src = CLIPVisionModel(CLIPVisionConfig(**TINY), rngs=nnx.Rngs(3))
    # export in HF torch layout
    from vision_pt_tpu.utils.state_dict import flatten_state

    sd = {}
    for k, v in flatten_state(src).items():
        v = np.ascontiguousarray(np.asarray(v))
        k = k.replace(".layers.", ".encoder.layers.")
        if k.endswith(".kernel") and v.ndim == 4:
            sd[k[: -len(".kernel")] + ".weight"] = np.ascontiguousarray(
                v.transpose(3, 2, 0, 1)
            )
        elif k.endswith(".kernel") and v.ndim == 2:
            sd[k[: -len(".kernel")] + ".weight"] = np.ascontiguousarray(v.T)
        elif k.endswith(".scale"):
            sd[k[: -len(".scale")] + ".weight"] = v
        elif k.endswith(".embedding"):
            sd[k[: -len(".embedding")] + ".weight"] = v
        else:
            sd[k] = v
    save_file(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({"vision_config": TINY}))

    enc = AutoImageEncoder(ImageEncoderConfig(
        weights_path=str(tmp_path), feature_type="pooler_output",
        feature_dim=32,
    ))
    pixels = jax.random.normal(jax.random.key(0), (2, 28, 28, 3))
    feats = enc(pixels)
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(src(pixels).pooler_output), atol=1e-5
    )

    enc_h = AutoImageEncoder(ImageEncoderConfig(
        weights_path=str(tmp_path), feature_type="hidden_state",
        hidden_state_index=-1, feature_dim=32,
    ))
    assert enc_h(pixels).shape == (2, 5, 32)
