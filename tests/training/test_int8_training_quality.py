"""int8 quantized-training path: matmul correctness, STE gradients, and
loss-curve quality on the synthetic conditional task (the opt-in throughput
lever documented in docs/PERF_CEILING.md; no reference analog — upstream
only quantizes inference weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from vision_pt_tpu.ops.quant.int8_training import (
    Int8TrainLinear,
    int8_matmul,
    quantize_training_inplace,
)


def test_int8_matmul_close_and_ste_grads():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    y = int8_matmul(x, w)
    ref = x @ w
    # int8 dynamic quant: ~1% relative error at these scales
    err = float(jnp.abs(y - ref).max()) / float(jnp.abs(ref).max())
    assert err < 0.02, err

    # straight-through grads equal the unquantized matmul's exactly
    g = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
    gx, gw = jax.grad(lambda x, w: jnp.sum(int8_matmul(x, w) * g), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(g @ w.T), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(x.T @ g), rtol=1e-5)


def test_quantize_training_inplace_swaps_and_preserves_params():
    class Tower(nnx.Module):
        def __init__(self, rngs):
            self.proj = nnx.Linear(8, 16, rngs=rngs)
            self.out = nnx.Linear(16, 8, rngs=rngs)

        def __call__(self, x):
            return self.out(jax.nn.gelu(self.proj(x)))

    m = Tower(nnx.Rngs(0))
    before = np.asarray(m.proj.kernel.value).copy()
    n = quantize_training_inplace(m, include_keys=["proj"])
    assert n == 1
    assert isinstance(m.proj, Int8TrainLinear)
    assert type(m.out) is nnx.Linear
    np.testing.assert_array_equal(np.asarray(m.proj.kernel.value), before)
    y = m(jnp.ones((2, 8)))
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_int8_training_loss_quality():
    """Train the tiny synthetic rectified-flow task with every Linear in
    int8 forward compute; the loss must converge like bf16/fp32 training
    (same harness as the latent patch-4 quality test)."""
    from tests.training.test_latent_patch4_quality import _train as _train_fp

    from vision_pt_tpu.models.jit.config import DenoiserConfig
    from vision_pt_tpu.models.jit.denoiser import Denoiser
    from vision_pt_tpu.ops.loss.flow_match import prepare_scaled_noised_latents
    from vision_pt_tpu.ops.timestep.sampling import scale_shift_sigmoid_randn
    from tests.training.test_latent_patch4_quality import (
        BATCH,
        CHANNELS,
        LATENT,
        N_CLASSES,
        STEPS,
        _class_targets,
    )

    cfg = DenoiserConfig(
        in_channels=CHANNELS, out_channels=CHANNELS, patch_size=4,
        hidden_size=64, depth=2, num_heads=2, bottleneck_dim=16,
        context_dim=32, context_start_block=0,
        rope_axes_dims=[8, 12, 12], num_time_tokens=2,
    )
    model = Denoiser(cfg, rngs=nnx.Rngs(0))
    n = quantize_training_inplace(model)
    assert n >= 8  # every projection in the tiny DiT
    optimizer = nnx.Optimizer(model, optax.adamw(1e-3), wrt=nnx.Param)
    targets = _class_targets(jax.random.key(100))
    class_emb = jax.random.normal(jax.random.key(101), (N_CLASSES, 1, 32))
    sizes = jnp.full((BATCH, 2), float(LATENT), dtype=jnp.float32)
    crop = jnp.zeros((BATCH, 2), dtype=jnp.float32)

    @nnx.jit
    def step(model, optimizer, key):
        k_c, k_t, k_n = jax.random.split(key, 3)
        labels = jax.random.randint(k_c, (BATCH,), 0, N_CLASSES)
        images = targets[labels]
        context = class_emb[labels]

        def loss_fn(m):
            t = scale_shift_sigmoid_randn(k_t, BATCH)
            noisy, _ = prepare_scaled_noised_latents(k_n, images, t)
            pred = m(noisy, t, context, sizes, sizes, crop)
            denom = jnp.maximum(1.0 - t.reshape(-1, 1, 1, 1), 0.05)
            return jnp.mean(jnp.square((pred - noisy) / denom
                                       - (images - noisy) / denom))

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    key = jax.random.key(0)
    losses = [
        float(step(model, optimizer, jax.random.fold_in(key, i)))
        for i in range(STEPS)
    ]
    head = float(np.mean(losses[:10]))
    tail = float(np.mean(losses[-10:]))
    assert np.isfinite(tail)
    assert tail < 0.5 * head, f"int8 training did not converge: {head} -> {tail}"

    # and within 1.3x of the fp32 run's final loss on the same task
    _, tail_fp = _train_fp(patch_size=4)
    assert tail < 1.3 * max(tail_fp, 1e-6), (tail, tail_fp)
