import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vision_pt_tpu.models.cogview4 import CogView4Config, CogView4Model, DenoiserConfig
from vision_pt_tpu.models.cogview4.denoiser import CogView4DiT, RoPE
from vision_pt_tpu.models.cogview4.pipeline import calculate_time_shift
from vision_pt_tpu.ops.timestep.sampling import time_shift_linear

pytestmark = pytest.mark.slow

TINY = dict(
    patch_size=2, in_channels=4, out_channels=4, num_layers=2,
    attention_head_dim=16, num_attention_heads=4, text_embed_dim=32,
    time_embed_dim=32, condition_dim=8, rope_axes_dim=[16, 16],
)


def test_time_shift_math():
    """Reference ``tests/models/test_cogview4.py:29`` pattern: the linear
    shift with resolution-dependent mu."""
    mu = calculate_time_shift(256)
    assert mu == pytest.approx(1.0)  # (256/256)^0.5 * 0.75 + 0.25
    t = jnp.asarray([0.5])
    shifted = float(time_shift_linear(mu, t)[0])
    assert shifted == pytest.approx(0.5)  # mu=1 is identity at t=0.5
    mu_big = calculate_time_shift(4096)
    assert mu_big > mu
    assert float(time_shift_linear(mu_big, t)[0]) > 0.5


def test_rope_tables():
    rope = RoPE(head_dim=16, patch_size=2, rope_axes_dim=(16, 16))
    cos, sin = rope(8, 8)  # latent 8x8 -> 4x4 grid
    assert cos.shape == (16, 16)
    np.testing.assert_allclose(cos**2 + sin**2, 1.0, atol=1e-6)
    # duplicated halves (rotate-half layout)
    np.testing.assert_array_equal(cos[:, :8], cos[:, 8:])


def test_dit_forward():
    model = CogView4DiT(DenoiserConfig(**TINY), rngs=nnx.Rngs(0))
    lat = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    ehs = jax.random.normal(jax.random.key(1), (2, 6, 32))
    t = jnp.asarray([500.0, 10.0])
    sz = jnp.full((2, 2), 64.0)
    out = model(lat, ehs, t, sz, sz, jnp.zeros_like(sz))
    assert out.shape == (2, 8, 8, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_pipeline_generate_with_mock_text_encoder(tmp_path):
    cfg = CogView4Config(
        checkpoint_path="", dtype="float32", denoiser=DenoiserConfig(**TINY),
        vae_config=dict(block_out_channels=(8, 16), layers_per_block=1,
                        norm_num_groups=4, latent_channels=4),
    )
    model = CogView4Model.from_config(cfg, build_text_encoder=False)

    class FakeTE:
        def encode_prompts(self, prompts, negative_prompts=None,
                           use_negative_prompts=False, max_token_length=16):
            n = len(prompts) if isinstance(prompts, list) else 1
            emb = jax.random.normal(jax.random.key(0), (n, 6, 32))
            from vision_pt_tpu.models.cogview4.text_encoder import (
                TextEncodingOutput,
            )
            return TextEncodingOutput(emb, jnp.ones((n, 6)), emb,
                                      jnp.ones((n, 6)))

    model.text_encoder = FakeTE()
    imgs = model.generate("a cat", width=16, height=16,
                          num_inference_steps=2, cfg_scale=2.0, seed=1,
                          execution_dtype=jnp.float32)
    assert len(imgs) == 1 and imgs[0].size == (16, 16)

    # sgm-style key roundtrip
    sd = model.state_dict()
    assert any(k.startswith("diffusion_model.") for k in sd)
    assert any(".ff.net.0.proj." in k for k in sd)
    from safetensors.numpy import save_file

    path = str(tmp_path / "cogview4.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
    m2 = CogView4Model.from_config(cfg, build_text_encoder=False)
    m2._load_checkpoint(path)
    from vision_pt_tpu.utils.state_dict import flatten_state

    a, b = flatten_state(model.denoiser), flatten_state(m2.denoiser)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_glm_lm_forward():
    from vision_pt_tpu.models.lm.model import DecoderLM, DecoderLMConfig

    cfg = DecoderLMConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, partial_rotary_factor=0.5, attention_bias=True, arch="glm",
    )
    lm = DecoderLM(cfg, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 10)))
    out = lm(ids)
    assert out.last_hidden_state.shape == (2, 10, 32)
    assert out.penultimate_hidden_state.shape == (2, 10, 32)


def test_glm_lm_parity_with_transformers():
    torch = pytest.importorskip("torch")
    from transformers import GlmConfig, GlmModel

    from vision_pt_tpu.models.lm.model import DecoderLM, DecoderLMConfig
    from vision_pt_tpu.models.sdxl.convert import unet_torch_to_nnx
    from vision_pt_tpu.models.sdxl.pipeline import _embed_fix
    from vision_pt_tpu.utils.state_dict import load_flat_state

    hf_cfg = GlmConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, partial_rotary_factor=0.5, attention_bias=True,
        rms_norm_eps=1e-6, rope_theta=10000.0, pad_token_id=1,
    )
    tm = GlmModel(hf_cfg)
    tm.eval()
    jcfg = DecoderLMConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, partial_rotary_factor=0.5, attention_bias=True,
        rms_norm_eps=1e-6, rope_theta=10000.0, arch="glm",
    )
    jm = DecoderLM(jcfg, rngs=nnx.Rngs(0))
    tsd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # HF RMSNorm '.weight' 1D params map to our bare nnx.Param names
    renamed = {}
    for k, v in tsd.items():
        if k.endswith("input_layernorm.weight") or k.endswith(
            "post_attention_layernorm.weight"
        ) or k == "norm.weight":
            renamed[k[: -len(".weight")]] = v
        else:
            renamed[k] = v
    load_flat_state(jm, unet_torch_to_nnx(_embed_fix(renamed)), strict=True)

    ids = np.random.default_rng(0).integers(0, 100, (2, 9))
    with torch.no_grad():
        tout = tm(torch.from_numpy(ids), output_hidden_states=True)
    jout = jm(jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(jout.penultimate_hidden_state),
        tout.hidden_states[-2].numpy(), atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jout.last_hidden_state),
        tout.last_hidden_state.numpy(), atol=2e-5,
    )
