"""Loss-curve quality of latent-space JiT at patch 4 (the honest 4x-token
throughput config — bench.py:bench_jit_latent) on a synthetic task.

PERF_CEILING.md's latent path claims patch-4 latents (64 image tokens at
256^2-equivalent vs pixel patch-16's 256) deliver the token reduction
without breaking learning. This test trains tiny rectified-flow JiTs on a
class-conditioned synthetic latent task at patch 2 and patch 4 over the
SAME data and asserts both converge (scaled-down proxy: 16^2 latents, so
patch 2 = 64 tokens, patch 4 = 16 tokens — the same 4x ratio).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
import optax

from vision_pt_tpu.models.jit.config import DenoiserConfig
from vision_pt_tpu.models.jit.denoiser import Denoiser
from vision_pt_tpu.ops.loss.flow_match import prepare_scaled_noised_latents
from vision_pt_tpu.ops.timestep.sampling import scale_shift_sigmoid_randn

LATENT = 16
CHANNELS = 4
N_CLASSES = 4
BATCH = 8
STEPS = 150


def _class_targets(key):
    """Per-class smooth latent patterns (learnable conditional structure)."""
    coarse = jax.random.normal(key, (N_CLASSES, 4, 4, CHANNELS))
    return jax.image.resize(
        coarse, (N_CLASSES, LATENT, LATENT, CHANNELS), "cubic"
    )


def _train(patch_size: int) -> tuple[float, float]:
    cfg = DenoiserConfig(
        in_channels=CHANNELS, out_channels=CHANNELS, patch_size=patch_size,
        hidden_size=64, depth=2, num_heads=2, bottleneck_dim=16,
        context_dim=32, context_start_block=0,
        rope_axes_dims=[8, 12, 12], num_time_tokens=2,
    )
    model = Denoiser(cfg, rngs=nnx.Rngs(0))
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
            v_target = (images - noisy) / denom
            v_pred = (pred - noisy) / denom
            return jnp.mean(jnp.square(v_pred - v_target))

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
    return head, tail


@pytest.mark.slow
@pytest.mark.parametrize("patch_size", [2, 4])
def test_latent_jit_converges(patch_size):
    head, tail = _train(patch_size)
    assert np.isfinite(tail)
    # conditional rectified flow on a learnable task: loss must drop hard
    assert tail < 0.5 * head, f"patch {patch_size}: {head:.4f} -> {tail:.4f}"
