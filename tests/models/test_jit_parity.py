"""Numerical parity against the PyTorch reference implementation.

Loads the reference JiT (mounted read-only at /root/reference) with CUDA deps
stubbed, copies its randomly-initialized weights into our JAX model via the
checkpoint converter, and compares forward outputs on identical inputs.
Skipped when the reference tree isn't present.
"""

import importlib.machinery
import os
import sys
from unittest.mock import MagicMock

import numpy as np

from tests.parity_record import record
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference repo not mounted",
)


@pytest.fixture(scope="module")
def reference_modules():
    for m in [
        "bitsandbytes", "bitsandbytes.nn", "bitsandbytes.functional",
        "torchao", "torchao.dtypes", "torchao.dtypes.nf4tensor", "torchao.float8",
        "optimum", "optimum.quanto", "flash_attn", "xformers", "xformers.ops",
    ]:
        mod = MagicMock()
        mod.__spec__ = importlib.machinery.ModuleSpec(m, None)
        sys.modules.setdefault(m, mod)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import functools

    import torch
    import src.models.jit.denoiser as tden
    import src.modules.attention as tattn
    from src.models.jit.config import DenoiserConfig as TorchDenoiserConfig
    from src.models.jit.denoiser import Denoiser as TorchDenoiser

    # fp32 attention on both sides for exact comparison
    tden.scaled_dot_product_attention = functools.partial(
        tattn.scaled_dot_product_attention, attention_dtype=torch.float32
    )
    return TorchDenoiser, TorchDenoiserConfig, torch


TINY_KW = dict(
    patch_size=4, hidden_size=64, depth=3, num_heads=2, bottleneck_dim=16,
    context_dim=32, context_start_block=1, rope_axes_dims=[8, 12, 12],
    num_time_tokens=2, norm_type="rms",
)


@pytest.mark.parametrize(
    "overrides",
    [
        {},
        {"use_output_bottleneck": True},
        {"do_context_fuse": True, "context_start_block": 0},
        {"norm_type": "layer"},
        {"timestep_scale": 1000.0},
    ],
)
def test_forward_parity_with_reference(reference_modules, overrides):
    TorchDenoiser, TorchDenoiserConfig, torch = reference_modules
    import jax.numpy as jnp
    from flax import nnx

    from vision_pt_tpu.models.jit.config import DenoiserConfig
    from vision_pt_tpu.models.jit.convert import torch_to_nnx
    from vision_pt_tpu.models.jit.denoiser import Denoiser as JaxDenoiser
    from vision_pt_tpu.ops.attention import (
        get_default_attention_dtype,
        set_default_attention_dtype,
    )
    from vision_pt_tpu.utils.state_dict import load_flat_state

    kw = {**TINY_KW, **overrides}
    tmodel = TorchDenoiser(TorchDenoiserConfig(**kw))
    tmodel.initialize_weights()
    tmodel.eval()

    jmodel = JaxDenoiser(DenoiserConfig(**kw), rngs=nnx.Rngs(0))
    load_flat_state(
        jmodel,
        torch_to_nnx({k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
                     rope_head_dim=32),
        strict=True,
    )

    rng = np.random.default_rng(0)
    batch = 2
    img = rng.normal(size=(batch, 3, 16, 16)).astype(np.float32)
    t = np.asarray([0.3, 0.7], dtype=np.float32)
    ctx = rng.normal(size=(batch, 5, 32)).astype(np.float32)
    mask = np.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=np.int64)
    osz = np.asarray([[16, 16], [16, 16]], dtype=np.float32)
    crop = np.zeros((batch, 2), dtype=np.float32)

    with torch.no_grad():
        tout = tmodel(
            image=torch.from_numpy(img),
            timestep=torch.from_numpy(t),
            context=torch.from_numpy(ctx),
            original_size=torch.from_numpy(osz),
            target_size=torch.from_numpy(osz),
            crop_coords=torch.from_numpy(crop),
            context_mask=torch.from_numpy(mask),
        ).numpy()

    _prev_attn_dtype = get_default_attention_dtype()
    set_default_attention_dtype(None)
    try:
        jout = jmodel(
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(t),
            jnp.asarray(ctx),
            jnp.asarray(osz),
            jnp.asarray(osz),
            jnp.asarray(crop),
            jnp.asarray(mask),
        )
    finally:
        set_default_attention_dtype(_prev_attn_dtype)
    jout_nchw = np.asarray(jout).transpose(0, 3, 1, 2)

    mse = np.mean((jout_nchw - tout) ** 2)
    psnr = 20 * np.log10(tout.max() - tout.min()) - 10 * np.log10(mse)
    record("jit_forward_psnr", psnr)
    assert psnr > 60.0, f"PSNR {psnr:.1f} dB below parity threshold"


@pytest.mark.slow
def test_training_loss_curve_parity_with_reference(reference_modules):
    """Driver config #1 measured golden (BASELINE.md): train the same tiny
    JiT in both frameworks — identical init weights, batches, timesteps and
    noise, AdamW both sides — and require the per-step loss curves to match.
    The torch curve is computed live from /root/reference, so this is a
    measured baseline, not an estimate (reference step math:
    ``train/jit/class_to_image.py:106-242``)."""
    TorchDenoiser, TorchDenoiserConfig, torch = reference_modules
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from vision_pt_tpu.models.jit.config import DenoiserConfig
    from vision_pt_tpu.models.jit.convert import torch_to_nnx
    from vision_pt_tpu.models.jit.denoiser import Denoiser as JaxDenoiser
    from vision_pt_tpu.ops.attention import (
        get_default_attention_dtype,
        set_default_attention_dtype,
    )
    from vision_pt_tpu.utils.state_dict import load_flat_state

    torch.manual_seed(0)
    tmodel = TorchDenoiser(TorchDenoiserConfig(**TINY_KW))
    tmodel.initialize_weights()
    tmodel.train()

    jmodel = JaxDenoiser(DenoiserConfig(**TINY_KW), rngs=nnx.Rngs(0))
    load_flat_state(
        jmodel,
        torch_to_nnx(
            {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
            rope_head_dim=32,
        ),
        strict=True,
    )

    lr, steps, batch, size = 1e-3, 6, 4, 16
    topt = torch.optim.AdamW(tmodel.parameters(), lr=lr, weight_decay=0.0)
    joptimizer = nnx.Optimizer(
        jmodel, optax.adamw(lr, weight_decay=0.0), wrt=nnx.Param
    )

    rng = np.random.default_rng(42)
    eps = 0.05

    def step_data():
        img = rng.normal(size=(batch, 3, size, size)).astype(np.float32)
        ctx = rng.normal(size=(batch, 5, 32)).astype(np.float32)
        t = (1 / (1 + np.exp(-rng.normal(-0.8, 0.8, size=batch)))).astype(
            np.float32
        )  # scale_shift_sigmoid-shaped
        noise = rng.normal(size=img.shape).astype(np.float32)
        # JiT polarity (clean at t=1): x_t = t*x0 + (1-t)*eps
        noisy = (
            t[:, None, None, None] * img
            + (1 - t[:, None, None, None]) * noise
        )
        osz = np.full((batch, 2), float(size), dtype=np.float32)
        crop = np.zeros((batch, 2), dtype=np.float32)
        mask = np.ones((batch, 5), dtype=np.int64)
        return img, ctx, t, noisy, osz, crop, mask

    def torch_loss(pred, img_t, noisy_t, t_t):
        denom = (1.0 - t_t).clamp(min=eps).view(-1, 1, 1, 1)
        return (((pred - noisy_t) / denom - (img_t - noisy_t) / denom) ** 2).mean()

    @nnx.jit
    def jax_step(model, optimizer, img, ctx, t, noisy, osz, crop, mask):
        def loss_fn(m):
            pred = m(noisy, t, ctx, osz, osz, crop, mask)
            denom = jnp.maximum(1.0 - t, eps).reshape(-1, 1, 1, 1)
            return jnp.mean(
                jnp.square((pred - noisy) / denom - (img - noisy) / denom)
            )

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    t_losses, j_losses = [], []
    fixed = step_data()  # one batch reused -> the loss actually descends
    _prev_attn_dtype = get_default_attention_dtype()
    set_default_attention_dtype(None)
    try:
        for _ in range(steps):
            img, ctx, t, noisy, osz, crop, mask = fixed

            topt.zero_grad()
            pred = tmodel(
                image=torch.from_numpy(noisy),
                timestep=torch.from_numpy(t),
                context=torch.from_numpy(ctx),
                original_size=torch.from_numpy(osz),
                target_size=torch.from_numpy(osz),
                crop_coords=torch.from_numpy(crop),
                context_mask=torch.from_numpy(mask),
            )
            tl = torch_loss(
                pred, torch.from_numpy(img), torch.from_numpy(noisy),
                torch.from_numpy(t),
            )
            tl.backward()
            topt.step()
            t_losses.append(float(tl))

            jl = jax_step(
                jmodel, joptimizer,
                jnp.asarray(img.transpose(0, 2, 3, 1)),
                jnp.asarray(ctx), jnp.asarray(t),
                jnp.asarray(noisy.transpose(0, 2, 3, 1)),
                jnp.asarray(osz), jnp.asarray(crop), jnp.asarray(mask),
            )
            j_losses.append(float(jl))
    finally:
        set_default_attention_dtype(_prev_attn_dtype)

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3, atol=2e-4)
    assert t_losses[-1] < t_losses[0]  # both actually trained
