"""RoPE retrofit adapter + distill workload tests (reference
``src/models/sdxl/adapter/rope.py`` / ``train/sdxl/rope_distill.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vision_pt_tpu.models.sdxl.adapter.rope import (
    DenoiserConfigWithRoPE,
    DenoiserWithRoPE,
    RoPEEmbedder,
    SelfAttentionWithRoPE,
    TransformerWithRoPE,
    while_rope_disabled,
    while_rope_enabled,
)
from vision_pt_tpu.models.sdxl.config import DenoiserConfig
from vision_pt_tpu.models.sdxl.denoiser import Denoiser
from vision_pt_tpu.workloads.sdxl_rope_distill import downscale
import pytest

pytestmark = pytest.mark.slow

TINY = dict(
    hidden_dim=32,
    block_out_channels=[32, 32, 64],
    num_transformers_per_block=[1, 1, 1],
    num_head_channels=16,
    context_dim=40,
    layers_per_block=1,
)


def test_rope_embedder_shapes_and_origin():
    emb = RoPEEmbedder(rope_dims=(8, 8), origin_position="top_left")
    img = emb.get_image_freqs(4, 6)
    assert img.shape == (24, 8, 2)  # sum(dims)//2 = 8 pairs
    # position (0,0) has angle 0 -> cos 1, sin 0
    np.testing.assert_allclose(img[0, :, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(img[0, :, 1], 0.0, atol=1e-6)

    centered = RoPEEmbedder(rope_dims=(8, 8), origin_position="center")
    cimg = centered.get_image_freqs(4, 6)
    # origin moves to (ceil(4//2), ceil(6//2)) = (2, 3) -> index 2*6+3
    np.testing.assert_allclose(cimg[2 * 6 + 3, :, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(cimg[2 * 6 + 3, :, 1], 0.0, atol=1e-6)

    ctx = emb.get_context_freqs(5)
    assert ctx.shape == (5, 8, 2)
    # diagonal positions: both axes share the index
    np.testing.assert_allclose(ctx[:, :4], ctx[:, 4:], atol=1e-6)


def _tiny_inputs(key=0):
    k = jax.random.PRNGKey(key)
    ks = jax.random.split(k, 3)
    lat = jax.random.normal(ks[0], (1, 8, 8, 4))
    ehs = jax.random.normal(ks[1], (1, 7, 40))
    pooled = jax.random.normal(ks[2], (1, 1280))
    t = jnp.asarray([13.0])
    sz = jnp.full((1, 2), 64.0)
    return lat, t, ehs, pooled, sz, sz, jnp.zeros_like(sz)


def test_rope_denoiser_toggle_matches_plain():
    cfg_plain = DenoiserConfig(**TINY)
    cfg_rope = DenoiserConfigWithRoPE(**TINY, rope_enabled=True,
                                      rope_dims=[8, 8])
    plain = Denoiser(cfg_plain, rngs=nnx.Rngs(0))
    rope = DenoiserWithRoPE(cfg_rope, rngs=nnx.Rngs(0))
    # identical param trees (RoPE adds no weights) -> copy state over
    nnx.update(rope, nnx.state(plain))

    args = _tiny_inputs()
    out_plain = plain(*args)

    rope.set_rope_enabled(False)
    out_disabled = rope(*args)
    np.testing.assert_allclose(
        np.asarray(out_disabled), np.asarray(out_plain), atol=1e-6
    )

    rope.set_rope_enabled(True)
    out_enabled = rope(*args)
    assert float(jnp.abs(out_enabled - out_plain).max()) > 1e-4


def test_while_rope_context_restores_flag():
    cfg = DenoiserConfigWithRoPE(**TINY, rope_enabled=True, rope_dims=[8, 8])

    class Holder:
        pass

    holder = Holder()
    holder.denoiser = DenoiserWithRoPE(cfg, rngs=nnx.Rngs(0))

    assert holder.denoiser.rope_enabled
    with while_rope_disabled(holder):
        assert not holder.denoiser.rope_enabled
        for _, m in _iter_rope_modules(holder.denoiser):
            assert not m.rope_enabled
    assert holder.denoiser.rope_enabled
    with while_rope_enabled(holder):
        assert holder.denoiser.rope_enabled
    assert holder.denoiser.rope_enabled


def _iter_rope_modules(denoiser):
    from vision_pt_tpu.peft.functional import iter_named_modules

    for name, m in iter_named_modules(denoiser):
        if isinstance(m, (TransformerWithRoPE, SelfAttentionWithRoPE)):
            yield name, m


def test_rope_applied_per_resolution():
    """Different spatial sizes get different freq tables, same weights."""
    cfg = DenoiserConfigWithRoPE(**TINY, rope_enabled=True, rope_dims=[8, 8])
    model = DenoiserWithRoPE(cfg, rngs=nnx.Rngs(0))
    lat8 = jnp.ones((1, 8, 8, 4))
    lat16 = jnp.ones((1, 16, 16, 4))
    _, t, ehs, pooled, sz, _, crop = _tiny_inputs()
    out8 = model(lat8, t, ehs, pooled, sz, sz, crop)
    out16 = model(lat16, t, ehs, pooled, sz, sz, crop)
    assert out8.shape == (1, 8, 8, 4)
    assert out16.shape == (1, 16, 16, 4)


def test_downscale_math():
    pix = jnp.ones((2, 96, 128, 3))
    orig = jnp.asarray([[96.0, 128.0]] * 2)
    crop = jnp.asarray([[3.0, 5.0]] * 2)
    out, o, t, c = downscale(pix, orig, orig, crop, ratio=2.0)
    assert out.shape == (2, 48, 64, 3)
    np.testing.assert_allclose(np.asarray(o), [[48.0, 64.0]] * 2)
    np.testing.assert_allclose(np.asarray(c), [[1.0, 2.0]] * 2)


def test_rope_freqs_parity_with_reference():
    import pytest as _pytest

    from tests.reference_stubs import install_stubs, reference_available

    if not reference_available():
        _pytest.skip("reference repo not mounted")
    install_stubs()
    import torch
    from src.models.sdxl.adapter.rope import (
        RoPEEmbedder as TorchRoPEEmbedder,
        apply_rope as torch_apply_rope,
    )

    from vision_pt_tpu.ops.rope import apply_rope as jax_apply_rope

    for origin in ("top_left", "center"):
        tref = TorchRoPEEmbedder(rope_dims=[8, 8], origin_position=origin)
        tref.eval()
        jref = RoPEEmbedder(rope_dims=(8, 8), origin_position=origin)
        tfreqs = tref.get_image_freqs(1, 5, 7, torch.device("cpu"))[0]
        jfreqs = jref.get_image_freqs(5, 7)  # (35, 8, 2)
        np.testing.assert_allclose(
            jfreqs[..., 0], tfreqs.real.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            jfreqs[..., 1], tfreqs.imag.numpy(), atol=1e-5
        )

        tcf = tref.get_context_freqs(1, 6, torch.device("cpu"))[0]
        jcf = jref.get_context_freqs(6)
        np.testing.assert_allclose(jcf[..., 0], tcf.real.numpy(), atol=1e-5)
        np.testing.assert_allclose(jcf[..., 1], tcf.imag.numpy(), atol=1e-5)

    # rotation application parity on (B, H, S, D)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 35, 16)).astype(np.float32)
    tfreqs_b = tref.get_image_freqs(2, 5, 7, torch.device("cpu"))
    t_out = torch_apply_rope(torch.from_numpy(x), tfreqs_b)
    j_out = jax_apply_rope(jnp.asarray(x), jnp.asarray(jfreqs))
    np.testing.assert_allclose(
        np.asarray(j_out), t_out.numpy(), atol=1e-5
    )
