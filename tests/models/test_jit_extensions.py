"""Tiny-config forward smoke + parity tests for the JiT extensions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vision_pt_tpu.models.jit.extension.cross import (
    CrossJiTDenoiserConfig,
    CrossJiT,
)
from vision_pt_tpu.models.jit.extension.ig import IGJiT, IGJiTDenoiserConfig
from vision_pt_tpu.models.jit.extension.loig import LoIGJiT, LoIGJiTDenoiserConfig
from vision_pt_tpu.models.jit.extension.pope import (
    NormalizedPopeEmbedder,
    PopeEmbedder,
    apply_pope,
)
from vision_pt_tpu.models.jit.extension.tread import (
    JiTWithTread,
    JiTWithTreadDenoiserConfig,
)
from vision_pt_tpu.models.jit.extension.uvit import UJiT, UJiTDenoiserConfig

TINY = dict(
    patch_size=4, hidden_size=64, depth=4, num_heads=2, bottleneck_dim=16,
    context_dim=32, context_start_block=1, rope_axes_dims=[8, 12, 12],
    num_time_tokens=2,
)


def _inputs(batch=2, size=16, ctx_len=5):
    img = jax.random.normal(jax.random.key(0), (batch, size, size, 3))
    t = jnp.linspace(0.2, 0.8, batch)
    ctx = jax.random.normal(jax.random.key(1), (batch, ctx_len, 32))
    mask = jnp.asarray(
        np.tile([1, 1, 1, 0, 0], (batch, 1)).astype(np.int32)
    )
    sz = jnp.full((batch, 2), float(size))
    crop = jnp.zeros((batch, 2))
    return img, t, ctx, sz, crop, mask


def test_pope_apply_doubles_dim():
    x = jax.random.normal(jax.random.key(0), (2, 6, 2, 8))
    emb = PopeEmbedder(axes_dims=(8,), axes_lens=(16,), zero_centered=(False,))
    pos = np.arange(6, dtype=np.float32).reshape(6, 1)
    freqs = jnp.asarray(emb(pos))
    assert freqs.shape == (6, 8, 2)
    out = apply_pope(x, freqs)
    assert out.shape == (2, 6, 2, 16)
    # magnitudes: |pair| == softplus(x)
    pairs = np.asarray(out).reshape(2, 6, 2, 8, 2)
    mags = np.linalg.norm(pairs, axis=-1)
    np.testing.assert_allclose(
        mags, np.asarray(jax.nn.softplus(x)), rtol=1e-4
    )
    # learned bias changes output
    out_b = apply_pope(x, freqs, learned_bias=jnp.full((2, 8), 0.5))
    assert float(jnp.max(jnp.abs(out_b - out))) > 1e-3


def test_normalized_pope_span():
    emb = NormalizedPopeEmbedder(
        axes_dims=(8, 8, 8), do_normalize=(False, True, True), normalize_by=64.0
    )
    pos = emb.prepare_image_position_ids(32, 32, 4, global_index=3)
    # fractional symmetric centering
    assert pos[:, 1].min() == -3.5 and pos[:, 1].max() == 3.5
    freqs = emb(pos)
    assert freqs.shape == (64, 24, 2)  # PoPE is full-dim


@pytest.mark.parametrize("pe", ["pope", "n-pope"])
def test_jit_with_pope_forward(pe):
    from vision_pt_tpu.models.jit.config import DenoiserConfig
    from vision_pt_tpu.models.jit.denoiser import JiT

    cfg = DenoiserConfig(**{**TINY, "positional_encoding": pe})
    model = JiT(cfg, rngs=nnx.Rngs(0))
    img, t, ctx, sz, crop, mask = _inputs()
    out = model(img, t, ctx, sz, sz, crop, mask)
    assert out.shape == img.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_ujit_forward():
    cfg = UJiTDenoiserConfig(**{**TINY, "depth": 2, "num_blocks": 6})
    model = UJiT(cfg, rngs=nnx.Rngs(0))
    assert len(model.down_blocks) == 2
    assert len(model.up_blocks) == 2
    assert len(model.out_blocks) == 1
    assert model.up_blocks[0].skip_merge is not None
    img, t, ctx, sz, crop, mask = _inputs()
    out = model(img, t, ctx, sz, sz, crop, mask)
    assert out.shape == img.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_cross_jit_forward():
    cfg = CrossJiTDenoiserConfig(**TINY)
    model = CrossJiT(cfg, rngs=nnx.Rngs(0))
    from vision_pt_tpu.models.jit.extension.cross import CrossJiTBlock

    assert sum(isinstance(b, CrossJiTBlock) for b in model.blocks) == 1
    img, t, ctx, sz, crop, mask = _inputs()
    out = model(img, t, ctx, sz, sz, crop, mask)
    assert out.shape == img.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_ig_forward_returns_intermediate():
    cfg = IGJiTDenoiserConfig(**{**TINY, "intermediate_output_idx": 1})
    model = IGJiT(cfg, rngs=nnx.Rngs(0))
    img, t, ctx, sz, crop, mask = _inputs()
    pred, inter = model(img, t, ctx, sz, sz, crop, mask)
    assert pred.shape == img.shape and inter.shape == img.shape
    assert float(jnp.max(jnp.abs(pred - inter))) > 1e-6


def test_loig_forward_returns_weak():
    cfg = LoIGJiTDenoiserConfig(**{**TINY, "internal_rank": 4})
    model = LoIGJiT(cfg, rngs=nnx.Rngs(0))
    img, t, ctx, sz, crop, mask = _inputs()
    pred, weak = model(img, t, ctx, sz, sz, crop, mask)
    assert pred.shape == img.shape and weak.shape == img.shape


def test_tread_routing_matches_full_at_eval_and_differs_in_train():
    cfg = JiTWithTreadDenoiserConfig(
        **{**TINY, "tread_route_rate": 0.5, "tread_start_block": 1,
           "tread_end_block": 3}
    )
    model = JiTWithTread(cfg, rngs=nnx.Rngs(0))
    img, t, ctx, sz, crop, mask = _inputs()
    out_eval = model(img, t, ctx, sz, sz, crop, mask)  # no route_key
    assert out_eval.shape == img.shape
    out_routed = model(
        img, t, ctx, sz, sz, crop, mask, route_key=jax.random.key(0)
    )
    assert out_routed.shape == img.shape
    assert float(jnp.max(jnp.abs(out_routed - out_eval))) > 1e-6
    # deterministic given the same key
    out_routed2 = model(
        img, t, ctx, sz, sz, crop, mask, route_key=jax.random.key(0)
    )
    np.testing.assert_allclose(
        np.asarray(out_routed), np.asarray(out_routed2), atol=1e-6
    )


@pytest.mark.slow
def test_uvit_parity_with_reference():
    from tests.reference_stubs import install_stubs, reference_available

    if not reference_available():
        pytest.skip("reference repo not mounted")
    install_stubs()
    import functools

    import torch
    import src.models.jit.extension.uvit as tuvit
    import src.models.jit.denoiser as tden
    import src.modules.attention as tattn
    from src.models.jit.extension.uvit import (
        Denoiser as TorchUJiT,  # UJiT itself skips nn.Module.__init__
        UJiTDenoiserConfig as TorchUJiTConfig,
    )

    fp32_attn = functools.partial(
        tattn.scaled_dot_product_attention, attention_dtype=torch.float32
    )
    tden.scaled_dot_product_attention = fp32_attn

    from vision_pt_tpu.models.jit.convert import torch_to_nnx
    from vision_pt_tpu.ops.attention import (
        get_default_attention_dtype,
        set_default_attention_dtype,
    )
    from vision_pt_tpu.utils.state_dict import load_flat_state

    kw = {**TINY, "depth": 2, "num_blocks": 6}
    tmodel = TorchUJiT(TorchUJiTConfig(**kw))
    tmodel.initialize_weights()
    tmodel.eval()
    jmodel = UJiT(UJiTDenoiserConfig(**kw), rngs=nnx.Rngs(0))
    load_flat_state(
        jmodel,
        torch_to_nnx({k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
                     rope_head_dim=32),
        strict=True,
    )
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t = np.asarray([0.3, 0.7], dtype=np.float32)
    ctx = rng.normal(size=(2, 5, 32)).astype(np.float32)
    mask = np.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=np.int64)
    osz = np.full((2, 2), 16.0, dtype=np.float32)
    crop = np.zeros((2, 2), dtype=np.float32)
    with torch.no_grad():
        tout = tmodel(
            image=torch.from_numpy(img), timestep=torch.from_numpy(t),
            context=torch.from_numpy(ctx), original_size=torch.from_numpy(osz),
            target_size=torch.from_numpy(osz),
            crop_coords=torch.from_numpy(crop),
            context_mask=torch.from_numpy(mask),
        ).numpy()
    _prev_attn_dtype = get_default_attention_dtype()
    set_default_attention_dtype(None)
    try:
        jout = jmodel(
            jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(t),
            jnp.asarray(ctx), jnp.asarray(osz), jnp.asarray(osz),
            jnp.asarray(crop), jnp.asarray(mask),
        )
    finally:
        set_default_attention_dtype(_prev_attn_dtype)
    jout_nchw = np.asarray(jout).transpose(0, 3, 1, 2)
    mse = np.mean((jout_nchw - tout) ** 2)
    psnr = 20 * np.log10(tout.max() - tout.min()) - 10 * np.log10(mse)
    assert psnr > 60.0, f"U-JiT PSNR {psnr:.1f} dB"
