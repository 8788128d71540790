"""Headline benchmark: JiT-B/16 256x256 pretraining throughput, one chip.

Runs the real training step (forward + backward + adamw update, bf16
compute) on synthetic data and reports steady-state images/sec/chip. At this
sequence length (298 tokens) the attention auto-dispatch picks XLA's fused
attention — the Pallas flash kernel only wins at S >= 1024, where its block
padding amortizes (measured: flash at S=298 pads to 512 and OOMs batch 128;
XLA is 1.4x faster at batch 64).

``vs_baseline`` compares against an estimated PyTorch-reference A100
throughput for the same workload (the reference publishes no numbers —
BASELINE.md). Estimate: JiT-B ~130M params, 256 image tokens + 42 aux tokens,
~2e11 train FLOPs/image; A100 bf16 312 TFLOP/s at a generous 40% MFU
=> ~600 img/s. The north-star target is 1.5x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

A100_REFERENCE_IMAGES_PER_SEC = 600.0


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from vision_pt_tpu.models.jit.config import JiT_B_16_Config
    from vision_pt_tpu.models.jit.denoiser import Denoiser
    from vision_pt_tpu.ops.loss.flow_match import prepare_scaled_noised_latents
    from vision_pt_tpu.ops.timestep.sampling import scale_shift_sigmoid_randn

    batch, size = 64, 256
    config = JiT_B_16_Config()
    model = Denoiser(config, dtype=jnp.bfloat16, param_dtype=jnp.float32,
                     rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(model, optax.adamw(1e-4), wrt=nnx.Param)

    context_len = 32
    sizes = jnp.full((batch, 2), float(size), dtype=jnp.float32)
    crop = jnp.zeros((batch, 2), dtype=jnp.float32)

    @nnx.jit
    def train_step(model, optimizer, images, context, key):
        k_t, k_n = jax.random.split(key)

        def loss_fn(m):
            t = scale_shift_sigmoid_randn(k_t, batch)
            noisy, noise = prepare_scaled_noised_latents(k_n, images, t)
            pred = m(noisy.astype(jnp.bfloat16), t, context, sizes, sizes, crop)
            denom = jnp.maximum(1.0 - t.reshape(-1, 1, 1, 1), 0.05)
            target_v = (images - noisy.astype(jnp.float32)) / denom
            pred_v = (pred.astype(jnp.float32) - noisy.astype(jnp.float32)) / denom
            return jnp.mean(jnp.square(pred_v - target_v))

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    key = jax.random.key(0)
    images = jax.random.normal(
        jax.random.key(1), (batch, size, size, 3), dtype=jnp.float32
    )
    context = jax.random.normal(
        jax.random.key(2), (batch, context_len, config.context_dim),
        dtype=jnp.bfloat16,
    )

    # warmup / compile
    train_step(model, optimizer, images, context, key).block_until_ready()

    # best-of-3 windows: the tunneled chip shares its host with other work,
    # so a single window under-reports when the host is briefly contended
    steps = 15
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(steps):
            loss = train_step(model, optimizer, images, context,
                              jax.random.fold_in(key, i))
        loss.block_until_ready()
        best = min(best, time.perf_counter() - t0)

    images_per_sec = batch * steps / best
    print(
        json.dumps(
            {
                "metric": "jit_b_256_train_images_per_sec_per_chip",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(
                    images_per_sec / A100_REFERENCE_IMAGES_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
