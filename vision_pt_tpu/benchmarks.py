"""Benchmark workload builders for the driver bench (``bench.py``).

The traced/compiled code for every bench section lives HERE, not in
bench.py, for two measured reasons on the tunneled chip:

- **Cache-key stability.** XLA's persistent compilation cache keys include
  op source locations; editing bench.py used to shift line numbers and
  silently invalidate every cached executable. Workloads in a library
  module only re-key when the workload itself changes.
- **Alarm-free warming.** bench.py hard-caps each section with SIGALRM.
  When the alarm fires right after a backend compile returns, it kills the
  Python-side *cache write*, so the next run compiles cold again (observed
  on the SDXL 1024^2 sections). ``python -m vision_pt_tpu.benchmarks warm``
  compiles the identical programs with no alarm, populating ``.jax_cache``
  so driver runs are warm.

Timing protocol (``time_steps``) guards against two tunneled-chip gotchas:
block_until_ready is unreliable over the tunnel (only a value fetch provably
waits) and repeated identical executions can be served from a remote cache
(every timed call varies its inputs).

The headline's ``vs_baseline`` denominator is documented in BASELINE.md
"Throughput anchor" (the torch reference publishes no numbers; loss-curve
parity is measured live in tests/models/test_jit_parity.py).
"""

from __future__ import annotations

import functools
import os
import time

# See BASELINE.md "Throughput anchor": A100 bf16 peak 312 TFLOP/s x 32%
# assumed eager-PyTorch MFU / measured 1.65e11 train-FLOPs per image
# (1.056e13 FLOPs/step at batch 64, XLA cost analysis) ~= 600 img/s.
A100_REFERENCE_IMAGES_PER_SEC = 600.0

# bf16 peak FLOP/s per chip by device kind substring
_CHIP_PEAK = [
    ("v5 lite", 197e12), ("v5e", 197e12),
    ("v5p", 459e12), ("v4", 275e12), ("v6", 918e12),
]


def setup_cache() -> None:
    """Point the persistent compilation cache at the repo's .jax_cache."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def chip_peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _CHIP_PEAK:
        if sub in kind:
            return peak
    return 197e12  # default: v5e


def time_steps(fn, steps: int = 10, windows: int = 3) -> float:
    """Best-of-N windows seconds per step; fn(i) must return a scalar whose
    float() closes the window (see module docstring for why)."""
    best = float("inf")
    step_counter = 0
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = fn(step_counter)
            step_counter += 1
        float(out)  # force a fetch
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


# ------------------------------------------------------------ JiT train


def _jit_train_setup(config, batch, size, *, dtype, param_dtype):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from .models.jit.denoiser import Denoiser
    from .ops.loss.flow_match import prepare_scaled_noised_latents
    from .ops.timestep.sampling import scale_shift_sigmoid_randn

    model = Denoiser(config, dtype=dtype, param_dtype=param_dtype,
                     rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(model, optax.adamw(1e-4), wrt=nnx.Param)

    context_len = 32
    sizes = jnp.full((batch, 2), float(size), dtype=jnp.float32)
    crop = jnp.zeros((batch, 2), dtype=jnp.float32)

    def loss_of(m, images, context, k_t, k_n):
        t = scale_shift_sigmoid_randn(k_t, batch)
        noisy, noise = prepare_scaled_noised_latents(k_n, images, t)
        pred = m(noisy.astype(dtype or images.dtype), t, context,
                 sizes, sizes, crop)
        denom = jnp.maximum(1.0 - t.reshape(-1, 1, 1, 1), 0.05)
        target_v = (images - noisy.astype(jnp.float32)) / denom
        pred_v = (pred.astype(jnp.float32) - noisy.astype(jnp.float32)) / denom
        return jnp.mean(jnp.square(pred_v - target_v))

    # pure-split step with donated train state: measured +9.5% over the
    # nnx.jit form on v5e (no per-step pytree traversal; params/opt-state
    # buffers update in place instead of round-tripping through fresh HBM)
    graphdef, state = nnx.split((model, optimizer))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pure_step(state, images, context, key):
        m, opt = nnx.merge(graphdef, state)
        k_t, k_n = jax.random.split(key)
        loss, grads = nnx.value_and_grad(
            lambda mm: loss_of(mm, images, context, k_t, k_n)
        )(m)
        opt.update(m, grads)
        _, new_state = nnx.split((m, opt))
        return new_state, loss

    images = jax.random.normal(
        jax.random.key(1), (batch, size, size, 3), dtype=jnp.float32
    )
    context = jax.random.normal(
        jax.random.key(2), (batch, context_len, config.context_dim),
        dtype=dtype or jnp.float32,
    )
    key = jax.random.key(0)
    return state, pure_step, images, context, key


def bench_headline() -> dict:
    import jax
    import jax.numpy as jnp

    from .models.jit.config import JiT_B_16_Config

    batch, size = 64, 256
    state, pure_step, images, context, key = _jit_train_setup(
        JiT_B_16_Config(), batch, size,
        dtype=jnp.bfloat16, param_dtype=jnp.float32,
    )
    # compile ONCE (AOT) and reuse the executable for cost analysis AND the
    # timed runs — a separate jit call would compile the program a second
    # time unless the persistent cache catches it
    compiled = pure_step.lower(state, images, context, key).compile()
    flops_per_step = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_step = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    state, loss = compiled(state, images, context, key)  # warmup
    float(loss)

    box = {"state": state}

    def run(i):
        box["state"], loss = compiled(
            box["state"], images, context, jax.random.fold_in(key, i)
        )
        return loss

    sec_per_step = time_steps(run, steps=15)
    images_per_sec = batch / sec_per_step

    mfu = None
    if flops_per_step:
        peak = chip_peak_flops(jax.devices()[0])
        mfu = round(flops_per_step / sec_per_step / peak, 4)
    return {
        "images_per_sec": round(images_per_sec, 2),
        "mfu": mfu,
        "flops_per_step": flops_per_step,
    }


def bench_jit_s_fp32() -> dict:
    import jax
    import jax.numpy as jnp

    from .models.jit.config import DenoiserConfig

    config = DenoiserConfig(
        patch_size=8, hidden_size=384, depth=12, num_heads=6,
        bottleneck_dim=64, context_dim=384, context_start_block=4,
        rope_axes_dims=[16, 24, 24], rope_axes_lens=[256, 64, 64],
    )
    batch, size = 64, 64
    state, pure_step, images, context, key = _jit_train_setup(
        config, batch, size, dtype=None, param_dtype=jnp.float32,
    )
    state, loss = pure_step(state, images, context, key)
    float(loss)

    box = {"state": state}

    def run(i):
        box["state"], loss = pure_step(
            box["state"], images, context, jax.random.fold_in(key, i)
        )
        return loss

    sec = time_steps(run, steps=20)
    return {"value": round(batch / sec, 2), "unit": "images/sec/chip"}


def bench_jit_latent() -> dict:
    """Driver config #2: JiT-B over cached VAE latents at 256^2-equivalent
    (32^2 x 4ch latents at patch 4 -> 64 image tokens vs pixel patch-16's
    256 — a real 4x token reduction; the step starts at the denoiser, no
    in-step VAE encode, per data/latent_cache.py). Loss-curve quality of
    this config on the synthetic task is asserted in
    tests/training/test_latent_patch4_quality.py."""
    import jax
    import jax.numpy as jnp

    from .models.jit.config import DenoiserConfig

    config = DenoiserConfig(
        in_channels=4, out_channels=4, patch_size=4,
        hidden_size=768, depth=12, num_heads=12, bottleneck_dim=128,
        context_dim=768, context_start_block=4,
        rope_axes_dims=[16, 24, 24], rope_axes_lens=[256, 64, 64],
    )
    batch, latent_size = 64, 32
    state, pure_step, images, context, key = _jit_train_setup(
        config, batch, latent_size,
        dtype=jnp.bfloat16, param_dtype=jnp.float32,
    )
    # cached latents stand in for images (4 channels)
    latents = jax.random.normal(
        jax.random.key(7), (batch, latent_size, latent_size, 4),
        dtype=jnp.float32,
    )
    state, loss = pure_step(state, latents, context, key)
    float(loss)

    box = {"state": state}

    def run(i):
        box["state"], loss = pure_step(
            box["state"], latents, context, jax.random.fold_in(key, i)
        )
        return loss

    sec = time_steps(run, steps=15)
    return {
        "value": round(batch / sec, 2),
        "unit": "images/sec/chip (256^2-equiv via cached VAE latents, "
                "32^2x4ch patch 4 = 64 image tokens vs pixel's 256)",
    }


def bench_sampler() -> dict:
    """JiT-B 256^2 end-to-end pipeline sampler (scanned Euler loop with CFG
    batch doubling — ``JiTModel.generate``): sampler steps/s."""
    import json
    import tempfile
    import time as _time

    import jax

    from .models.jit.config import JiTConfig
    from .models.jit.pipeline import JiTModel

    label2id = tempfile.mktemp(suffix=".json")
    with open(label2id, "w") as f:
        json.dump({f"c{i}": i for i in range(4)}, f)
    config = JiTConfig(
        context_encoder={"type": "class", "label2id_map_path": label2id},
        denoiser={
            "patch_size": 16, "hidden_size": 768, "depth": 12,
            "num_heads": 12, "bottleneck_dim": 128, "context_dim": 768,
            "context_start_block": 4, "rope_axes_dims": [16, 24, 24],
            "rope_axes_lens": [256, 128, 128],
        },
        dtype="bfloat16",
    )
    model = JiTModel.new_with_config(config)
    batch, steps = 8, 20

    import jax.numpy as jnp

    def sample(seed):
        return model.generate(
            prompt=["c1"] * batch, width=256, height=256,
            num_inference_steps=steps, cfg_scale=2.0, seed=seed,
            return_arrays=True,
        )

    # Timing follows the module-wide protocol (see docstring): the window is
    # closed by a VALUE fetch — but of a scalar on-device reduction, not the
    # 6 MiB image batch. Over this box's ~43 MiB/s tunnel the full-batch
    # device_get costs ~140 ms (~40% of a trial); on a real TPU host the same
    # PCIe fetch is ~1 ms, so counting it mismeasures sampler-step work.
    out = sample(0)  # compile
    best = float("inf")
    for trial in range(3):
        t0 = _time.perf_counter()
        out = sample(trial + 1)  # fresh seed: varies the executed inputs
        float(jnp.mean(out))  # scalar value fetch provably waits
        best = min(best, (_time.perf_counter() - t0) / steps)
    images = jax.device_get(out)  # full fetch outside the timed region
    assert float(jnp.isfinite(jnp.asarray(images)).all())
    return {
        "value": round(1.0 / best, 2),
        "unit": f"pipeline_sampler_steps/sec (batch {batch}, CFG, scanned)",
    }


def bench_flash_attention() -> dict:
    """fwd+bwd kernel time, K iterations chained INSIDE one compiled program
    (per-call dispatch over the tunneled chip costs ~ms and would swamp the
    kernel)."""
    import jax
    import jax.numpy as jnp

    from .ops.attention import dot_product_attention

    b, s, h, d = 4, 4096, 12, 64
    reps = 8
    qs = [
        jax.random.normal(jax.random.key(i), (b, s, h, d), dtype=jnp.bfloat16)
        for i in range(4)
    ]

    def make(backend):
        def f(q):
            return (dot_product_attention(q, q, q, backend=backend) ** 2).sum()

        @jax.jit
        def chained(q):
            def body(q, _):
                loss, g = jax.value_and_grad(f)(q)
                # data dependency defeats CSE; scale keeps values sane
                return q + g.astype(q.dtype) * jnp.bfloat16(1e-6), loss

            q, losses = jax.lax.scan(body, q, None, length=reps)
            return losses.sum()

        chained(qs[0])  # compile
        return chained

    flash = make("flash")
    xla = make("xla")
    t_flash = time_steps(lambda i: flash(qs[i % len(qs)]), steps=3) / reps
    t_xla = time_steps(lambda i: xla(qs[i % len(qs)]), steps=3) / reps
    return {
        "value": round(t_xla / t_flash, 3),
        "unit": f"flash_speedup_vs_xla (S={s}, fwd+bwd)",
        "flash_ms": round(t_flash * 1e3, 2),
        "xla_ms": round(t_xla * 1e3, 2),
    }


def bench_nf4_matmul() -> dict:
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from .ops.quant.layers import QuantLinear4bit

    m, k, n = 64, 8192, 8192
    lin = nnx.Linear(k, n, use_bias=False, dtype=jnp.bfloat16,
                     param_dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    qlin = QuantLinear4bit.from_linear(lin, quant_type="nf4")
    xs = [
        jax.random.normal(jax.random.key(1 + i), (m, k), dtype=jnp.bfloat16)
        for i in range(4)
    ]

    reps = 32

    def make(layer):
        @nnx.jit
        def chained(layer, x):
            def body(x, _):
                y = layer(x)
                return x + y * jnp.bfloat16(1e-6), y.sum()

            x, ys = jax.lax.scan(body, x, None, length=reps)
            return ys.sum()

        chained(layer, xs[0])  # compile
        return chained

    bf16 = make(lin)
    q4 = make(qlin)
    t_bf16 = time_steps(lambda i: bf16(lin, xs[i % len(xs)]), steps=3) / reps
    t_q4 = time_steps(lambda i: q4(qlin, xs[i % len(xs)]), steps=3) / reps
    return {
        "value": round(t_bf16 / t_q4, 3),
        "unit": f"nf4_pallas_vs_bf16_matmul_ratio (M={m}, {k}x{n})",
        "nf4_us": round(t_q4 * 1e6, 1),
        "bf16_us": round(t_bf16 * 1e6, 1),
    }


# ------------------------------------------------------------ SDXL LoRA


def _sdxl_lora_setup(batch: int, res: int, quantize: bool):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from .models.sdxl.config import DenoiserConfig
    from .models.sdxl.denoiser import Denoiser
    from .ops.loss.diffusion import prepare_noised_latents
    from .peft import AdapterParam, LoRAConfig
    from .peft.functional import replace_to_peft_layer

    latent = res // 8
    unet = Denoiser(DenoiserConfig(), dtype=jnp.bfloat16,
                    param_dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    unet.set_gradient_checkpointing(True)
    if quantize:
        from .ops.quant.functional import quantize_inplace

        quantize_inplace(unet, "bnb_nf4", include_keys=[""])
    replace_to_peft_layer(
        unet, ["attn1", "attn2"], [],
        LoRAConfig(type="lora", rank=16, alpha=1.0, dtype="bfloat16"), seed=0,
    )
    opt = nnx.Optimizer(unet, optax.adamw(1e-4), wrt=AdapterParam)

    latents = jax.random.normal(jax.random.key(0),
                                (batch, latent, latent, 4), dtype=jnp.bfloat16)
    ehs = jax.random.normal(jax.random.key(1), (batch, 154, 2048),
                            dtype=jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(2), (batch, 1280),
                               dtype=jnp.bfloat16)
    sizes = jnp.full((batch, 2), float(res), dtype=jnp.float32)
    crop = jnp.zeros((batch, 2), dtype=jnp.float32)

    @nnx.jit
    def train_step(unet, opt, latents, ehs, pooled, key):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (batch,), 0, 1000)

        def loss_fn(m):
            noisy, noise = prepare_noised_latents(
                kn, latents.astype(jnp.float32), t
            )
            pred = m(noisy.astype(jnp.bfloat16), t.astype(jnp.float32), ehs,
                     pooled, sizes, sizes, crop)
            return jnp.mean(jnp.square(pred.astype(jnp.float32) - noise))

        loss, grads = nnx.value_and_grad(
            loss_fn, argnums=nnx.DiffState(0, AdapterParam)
        )(unet)
        opt.update(unet, grads)
        return loss

    key = jax.random.key(3)
    return unet, opt, train_step, latents, ehs, pooled, key


def bench_sdxl_lora(quantize: bool) -> dict:
    import jax

    batch, res = 4, 1024
    unet, opt, train_step, latents, ehs, pooled, key = _sdxl_lora_setup(
        batch, res, quantize
    )
    float(train_step(unet, opt, latents, ehs, pooled, key))
    sec = time_steps(
        lambda i: train_step(unet, opt, latents, ehs, pooled,
                             jax.random.fold_in(key, i)),
        steps=5, windows=2,
    )
    label = "sdxl_qlora_nf4" if quantize else "sdxl_lora_bf16"
    return {
        "value": round(batch / sec, 3),
        "unit": f"images/sec/chip ({label}, {res}^2, rank16, remat)",
    }


def bench_jit_s_fp32_scan() -> dict:
    """JiT-S 64^2 fp32 driver config, K optimizer steps chained in ONE
    compiled program (lax.scan over the same pure step). The per-call
    tunnel dispatch (~1-3 ms) is 10-25%% of this tiny model's ~15 ms step
    and made the per-step variant swing 2.8k-4.6k img/s across runs;
    chaining amortizes dispatch to <1%% and stabilizes the number. The
    workload is unchanged: K real donated-state adamw steps."""
    import functools

    import jax
    import jax.numpy as jnp

    from .models.jit.config import DenoiserConfig

    config = DenoiserConfig(
        patch_size=8, hidden_size=384, depth=12, num_heads=6,
        bottleneck_dim=64, context_dim=384, context_start_block=4,
        rope_axes_dims=[16, 24, 24], rope_axes_lens=[256, 64, 64],
    )
    batch, size, reps = 64, 64, 8
    state, pure_step, images, context, key = _jit_train_setup(
        config, batch, size, dtype=None, param_dtype=jnp.float32,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, keys):
        def body(s, k):
            s, loss = pure_step(s, images, context, k)
            return s, loss

        state, losses = jax.lax.scan(body, state, keys)
        return state, losses.sum()

    def keys_for(i):
        return jax.random.split(jax.random.fold_in(key, i), reps)

    state, total = multi_step(state, keys_for(10_000))  # compile
    float(total)

    box = {"state": state}

    def run(i):
        box["state"], total = multi_step(box["state"], keys_for(i))
        return total

    sec = time_steps(run, steps=3, windows=4) / reps
    return {"value": round(batch / sec, 2), "unit": "images/sec/chip"}


E2E_IMAGE_DIR = "/tmp/vptpu_e2e_jpegs"
E2E_NUM_IMAGES = 512


def _ensure_e2e_image_set(n: int = E2E_NUM_IMAGES,
                          root: str = E2E_IMAGE_DIR) -> list[dict]:
    """Generate (once, cached in /tmp) an on-disk JPEG set with sidecar
    captions: textured gradients at mixed non-square source sizes, encode
    quality 85 — a realistic decode workload without binary fixtures."""
    from pathlib import Path

    import numpy as np
    from PIL import Image

    rootp = Path(root)
    done = rootp / ".complete"
    if not (done.exists() and len(list(rootp.glob("*.jpg"))) >= n):
        rootp.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(0)
        widths = [320, 352, 384, 336]
        heights = [288, 384, 320, 352]
        yy_cache: dict[tuple[int, int], tuple] = {}
        for i in range(n):
            w = widths[i % len(widths)]
            h = heights[(i // len(widths)) % len(heights)]
            if (h, w) not in yy_cache:
                yy_cache[(h, w)] = np.meshgrid(
                    np.linspace(0, 4 * np.pi, w, dtype=np.float32),
                    np.linspace(0, 4 * np.pi, h, dtype=np.float32),
                )
            xs, ys = yy_cache[(h, w)]
            phase = rng.uniform(0, 2 * np.pi, size=3).astype(np.float32)
            base = np.stack(
                [127 + 100 * np.sin(xs * (1 + c * 0.3) + ys + phase[c])
                 for c in range(3)], axis=-1,
            )
            noise = rng.normal(0, 12, size=(h, w, 3)).astype(np.float32)
            arr = np.clip(base + noise, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(rootp / f"img_{i:05d}.jpg", quality=85)
            (rootp / f"img_{i:05d}.txt").write_text(f"bench class {i % 16}")
        done.write_text("ok")
    items = []
    for p in sorted(rootp.glob("*.jpg"))[:n]:
        items.append({
            "image": str(p),
            "caption": p.with_suffix(".txt").read_text(),
        })
    return items


def bench_e2e_pipeline() -> dict:
    """The headline JiT-B/16 256^2 train step fed by the REAL input
    pipeline — on-disk JPEGs -> native C decode in a WORKER PROCESS
    (data/worker_pool.py, the torch DataLoader-workers analog the reference
    gets from ``src/dataloader.py:33-48``) -> shared memory -> device.

    Round-4 diagnosis (VERDICT r5 item 2): the thread-based producer
    delivered only 149 img/s in the driver run, half the 316 img/s
    standalone decode rate, because the decode thread's per-item Python
    glue serializes on the GIL against the consumer's dispatch work.
    Worker PROCESSES own their GIL; the consumer only does a zero-copy
    shm read + device_put. The section reports where every millisecond
    went (consumer wait vs worker decode vs device) so ``bound`` names
    the measured bottleneck instead of inferring it."""
    import time

    import jax
    import jax.numpy as jnp

    from .data import native_image
    from .data.text_to_image import TextToImageBucket
    from .data.worker_pool import (
        BatchWorkerPool,
        infinite_indices,
        pool_cpu_budget,
    )
    from .models.jit.config import JiT_B_16_Config

    batch, size = 64, 256
    items = _ensure_e2e_image_set()
    bucket_u8 = TextToImageBucket(
        items=items, batch_size=batch, width=size, height=size,
        do_upscale=False, seed=0, output_dtype="uint8",
    )

    # host-only decode rate (in-process, no device in the loop)
    for _ in range(2):
        bucket_u8.get_batch(0)  # warm page cache + thread pool
    t0 = time.perf_counter()
    nb = 4
    for bi in range(nb):
        bucket_u8.get_batch(bi)
    host_rate = nb * batch / (time.perf_counter() - t0)

    # the EXACT headline training program (same shapes/dtypes -> same
    # executable, warm from the headline section's compile) behind a
    # device-side uint8 -> [-1, 1] normalize (4x fewer H2D bytes; XLA
    # fuses the normalize into the step's first consumer op)
    state, pure_step, images, context, key = _jit_train_setup(
        JiT_B_16_Config(), batch, size,
        dtype=jnp.bfloat16, param_dtype=jnp.float32,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_u8(state, img_u8, context, key):
        imgs = img_u8.astype(jnp.float32) / 127.5 - 1.0
        return pure_step(state, imgs, context, key)

    img_u8 = jnp.zeros((batch, size, size, 3), dtype=jnp.uint8)
    compiled_u8 = step_u8.lower(state, img_u8, context, key).compile()

    # in-section H2D roofline probe (VERDICT r4 item 2): the tunneled chip's
    # host->device link measures ~25-35 MiB/s with NO compute overlap
    # (probed 2026-08-19: 12 MiB best 346 ms, parallel streams slower, a
    # 46 ms matmul burn + put = put + burn serialized), so the uint8 pixel
    # feed (192 KiB/img) is link-bound far below the decode and device
    # rates. Measure the link HERE so the artifact carries its own ceiling.
    import numpy as np

    touch = jax.jit(lambda a: a.ravel()[0].astype(jnp.float32))
    probe = np.random.default_rng(0).integers(
        0, 255, size=(batch, size, size, 3), dtype=np.uint8
    )
    float(touch(jax.device_put(probe)))  # warm the transfer path
    h2d_best = float("inf")
    for i in range(3):
        probe[0, 0, 0, 0] = i  # vary: dodge remote result caching
        t0 = time.perf_counter()
        float(touch(jax.device_put(probe)))
        h2d_best = min(h2d_best, time.perf_counter() - t0)
    img_bytes = size * size * 3
    h2d_mib_s = probe.nbytes / h2d_best / 2**20
    h2d_ceiling_img_s = probe.nbytes / h2d_best / img_bytes

    def to_device(b):
        arr = jax.device_put(b["image"])
        # commit the transfer before the shm slot is recycled: device_put
        # from a numpy view is async and the next batch would overwrite it
        return jax.block_until_ready(arr)

    pool = BatchWorkerPool(
        bucket_u8.get_batch, infinite_indices(bucket_u8.num_batches),
        num_workers=pool_cpu_budget(), depth=3,
    )
    put_s = [0.0]

    def timed_to_device(b):
        t = time.perf_counter()
        out = to_device(b)
        put_s[0] += time.perf_counter() - t
        return out

    it = pool.iter_device(timed_to_device)
    try:
        state, loss = compiled_u8(state, next(it), context, key)
        float(loss)  # warmup (drains the first prefetched batch)
        # pre-fold per-step keys: over the tunnel every tiny dispatch costs
        # ms; a real trainer folds the key INSIDE the jitted step
        keys = [jax.device_put(jax.random.fold_in(key, i)) for i in range(40)]
        jax.block_until_ready(keys)
        wait0, decode0, put0 = (
            pool.consumer_wait_s, pool.worker_decode_s, put_s[0])
        best = float("inf")
        step_i = 0
        t_meas0 = time.perf_counter()
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                state, loss = compiled_u8(state, next(it), context,
                                          keys[step_i])
                step_i += 1
            float(loss)  # close the window with a real device sync
            best = min(best, (time.perf_counter() - t0) / 10)
        measured_s = time.perf_counter() - t_meas0
        consumer_wait = pool.consumer_wait_s - wait0
        worker_decode = pool.worker_decode_s - decode0
        device_put_s = put_s[0] - put0
        # pure device rate of the SAME compiled program (one resident batch,
        # no feed in the loop): the step term of the no-overlap link model
        fixed = next(it)
        t0 = time.perf_counter()
        for _ in range(10):
            state, loss = compiled_u8(state, fixed, context,
                                      keys[step_i % len(keys)])
            step_i += 1
        float(loss)
        step_s = (time.perf_counter() - t0) / 10
    finally:
        pool.close()

    e2e = batch / best
    ratio = e2e / host_rate if host_rate else 0.0
    # one threshold, stated once (ADVICE r4): the pipeline is decode-bound
    # when it delivers >= 85% of the standalone single-core decode rate
    host_decode_bound = bool(ratio >= 0.85)
    wait_share = consumer_wait / measured_s if measured_s else 0.0
    ratio_vs_link = e2e / h2d_ceiling_img_s if h2d_ceiling_img_s else 0.0
    # the e2e rate cannot exceed 1/(transfer + step) when the link doesn't
    # overlap compute; ``predicted`` carries that model so the artifact
    # shows the measurement agrees with the measured link, not a guess
    predicted = batch / (batch * img_bytes / (h2d_mib_s * 2**20) + step_s)
    bound = (
        "host_decode" if host_decode_bound
        else ("worker_feed" if wait_share > 0.5 else (
            "tunnel_h2d_link" if ratio_vs_link >= 0.6
            else "device_or_dispatch"))
    )
    return {
        "value": round(e2e, 2),
        "unit": "images/sec/chip (e2e: disk->decode(worker proc)->train)",
        "host_decode_images_per_sec": round(host_rate, 1),
        "e2e_over_decode_ratio": round(ratio, 3),
        "host_decode_bound": host_decode_bound,
        "bound": bound,
        "h2d_link_mib_s": round(h2d_mib_s, 1),
        "h2d_link_ceiling_img_s": round(h2d_ceiling_img_s, 1),
        "e2e_over_link_ceiling": round(ratio_vs_link, 3),
        "device_rate_img_s": round(batch / step_s, 1) if step_s else 0.0,
        "predicted_img_s_no_overlap": round(predicted, 1),
        "consumer_wait_s_per_30_steps": round(consumer_wait, 2),
        "worker_decode_s_per_30_steps": round(worker_decode, 2),
        "device_put_s_per_30_steps": round(device_put_s, 2),
        "native_loader": bool(native_image.native_available()),
        "num_images": len(items),
        "num_workers": pool_cpu_budget(),
        "host_cpu_count": __import__("os").cpu_count(),
    }


E2E_LATENT_DIR = "/tmp/vptpu_e2e_latents"


def _ensure_latent_cache(n: int = E2E_NUM_IMAGES, size: int = 32,
                         ch: int = 4, root: str = E2E_LATENT_DIR) -> list:
    """Generate (once, cached in /tmp) a synthetic on-disk latent cache in
    data/latent_cache.py's EXACT format: manifest rows + per-item fp16
    mean/std npz files."""
    import json as _json
    from pathlib import Path

    import numpy as np

    rootp = Path(root)
    done = rootp / ".complete"
    manifest = rootp / "manifest.jsonl"
    if not (done.exists() and manifest.exists()):
        rootp.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(0)
        rows = []
        for i in range(n):
            name = f"lat_{i:05d}.npz"
            np.savez(
                rootp / name,
                mean=rng.standard_normal((size, size, ch)).astype(np.float16),
                std=(0.1 + 0.05 * rng.random((size, size, ch))).astype(
                    np.float16
                ),
            )
            rows.append({
                "file": name, "caption": f"bench class {i % 16}",
                "width": size * 8, "height": size * 8,
                "original_size": [size * 8, size * 8],
                "target_size": [size * 8, size * 8],
                "crop_coords_top_left": [0, 0],
                "scaling_factor": 0.13025,
            })
        with open(manifest, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        done.write_text("ok")
    with open(manifest) as f:
        return [_json.loads(line) for line in f]


def bench_latent_e2e() -> dict:
    """The latent-space JiT-B train step (driver config #2, same program as
    ``bench_jit_latent``) fed by the REAL cached-latent pipeline: on-disk
    npz latent cache -> ``CachedLatentBucket`` (mean + std * eps draw) in a
    worker process -> shared memory -> device.

    Companion evidence for the pixel e2e's tunnel-H2D roofline: latents are
    16 KiB/img f32 vs the pixel feed's 192 KiB/img, so this section shows
    what the SAME pipeline architecture delivers when per-image bytes fit
    the host->device link — the gap to the pixel e2e is the link, not the
    loader. Reference analog: ``src/dataloader.py:33-48`` workers feeding
    in-step VAE encodes (the reference has no latent cache at all)."""
    import time

    import jax
    import jax.numpy as jnp

    from .data.latent_cache import CachedLatentBucket
    from .data.worker_pool import (
        BatchWorkerPool,
        infinite_indices,
        pool_cpu_budget,
    )
    from .models.jit.config import DenoiserConfig

    batch, latent_size = 64, 32
    rows = _ensure_latent_cache(size=latent_size)
    bucket = CachedLatentBucket(
        rows, E2E_LATENT_DIR, batch_size=batch, sample=True, seed=0,
    )

    config = DenoiserConfig(
        in_channels=4, out_channels=4, patch_size=4,
        hidden_size=768, depth=12, num_heads=12, bottleneck_dim=128,
        context_dim=768, context_start_block=4,
        rope_axes_dims=[16, 24, 24], rope_axes_lens=[256, 64, 64],
    )
    state, pure_step, _, context, key = _jit_train_setup(
        config, batch, latent_size,
        dtype=jnp.bfloat16, param_dtype=jnp.float32,
    )

    def make_batch(i):
        return {"latents": bucket.get_batch(i)["latents"]}

    def to_device(b):
        return jax.block_until_ready(jax.device_put(b["latents"]))

    pool = BatchWorkerPool(
        make_batch, infinite_indices(bucket.num_batches),
        num_workers=pool_cpu_budget(), depth=3,
    )
    try:
        it = pool.iter_device(to_device)
        state, loss = pure_step(state, next(it), context, key)
        float(loss)  # warmup/compile
        keys = [jax.device_put(jax.random.fold_in(key, i)) for i in range(40)]
        jax.block_until_ready(keys)
        best = float("inf")
        step_i = 0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                state, loss = pure_step(state, next(it), context,
                                        keys[step_i % len(keys)])
                step_i += 1
            float(loss)
            best = min(best, (time.perf_counter() - t0) / 10)
        # pure device rate of the same program (resident batch, no feed)
        fixed = next(it)
        t0 = time.perf_counter()
        for _ in range(10):
            state, loss = pure_step(state, fixed, context,
                                    keys[step_i % len(keys)])
            step_i += 1
        float(loss)
        step_s = (time.perf_counter() - t0) / 10
    finally:
        pool.close()

    e2e = batch / best
    return {
        "value": round(e2e, 2),
        "unit": "images/sec/chip (e2e: disk latent cache->worker->train, "
                "256^2-equiv 32^2x4ch f32)",
        "device_rate_img_s": round(batch / step_s, 1),
        "e2e_over_device_rate": round(e2e * step_s / batch, 3),
        "bytes_per_img": latent_size * latent_size * 4 * 4,
        "num_workers": pool_cpu_budget(),
    }


# ------------------------------------------------------------ canary


def measure_canary() -> dict:
    """Per-section contention probe (VERDICT r4 item 4): a fixed-cost host
    loop and a fixed tiny device round-trip, each ~identical run-to-run on
    an idle box. A hot canary next to a regressed section says 'contended
    run, re-measure'; a cool canary makes the regression real. Values are
    recorded per section so BENCH artifacts carry their own idle-ness
    evidence."""
    import numpy as np

    # host probe: fixed numpy work, single-threaded, ~40 ms idle
    a = np.random.default_rng(0).standard_normal((384, 384)).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(8):
        a = np.tanh(a @ a.T * 1e-3)
    host_ms = (time.perf_counter() - t0) * 1e3

    # device probe: tiny dispatch + scalar fetch — measures the tunnel
    # latency floor (~0.7-3 ms idle; swells when the host or tunnel is busy)
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x * x).sum())
    x = jnp.ones((8, 128))
    float(f(x))  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return {"host_ms": round(host_ms, 1), "dispatch_ms": round(best * 1e3, 2)}


def prior_section_values(repo_dir: str | None = None) -> dict[str, float]:
    """Section values from the newest BENCH_r*.json artifact in the repo —
    the comparison base for the >10%-regression re-run rule."""
    import glob
    import json as _json

    repo = repo_dir or os.path.dirname(os.path.dirname(__file__))
    paths = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    for path in reversed(paths):
        try:
            with open(path) as f:
                doc = _json.load(f)
            parsed = doc.get("parsed", doc)
            out = {"headline": float(parsed["value"])}
            for name, section in (parsed.get("extra") or {}).items():
                if isinstance(section, dict) and isinstance(
                    section.get("value"), (int, float)
                ):
                    out[name] = float(section["value"])
            return out
        except Exception:  # noqa: BLE001
            continue
    return {}


# ------------------------------------------------------------ registry

# (name, fn, floor_s, cap_s, isolate): floor = min budget remaining to start
# the section; cap = wall-clock cap (SIGALRM in-process, subprocess timeout
# when isolate). Ordered cheapest-first so a short driver window still
# records the most sections.
#
# isolate=True runs the section as ``python -m vision_pt_tpu.benchmarks
# section NAME`` in a FRESH process, for three measured reasons:
# - persistent-cache keys for big nnx-traced programs differ between an
#   isolated process and one that ran other sections first (two 83 MB
#   entries for the same source, 2026-08-17); always-isolated => one key.
# - the r4 driver run SIGKILLed the remote tpu_compile_helper on
#   sdxl_lora twice (BENCH_r04.json) while the same section passed solo;
#   a fresh client session + retry is the fix that doesn't guess at the
#   helper's memory state.
# - section-to-section interference (thread pools, allocator growth) is
#   what made r4's jit_s/sampler numbers swing -18..-22% vs r3.
#
# Cap sizing: on the tunneled chip, persistent-cache HITS for 50-80 MB
# executables cost 60-120 s (load/transfer); the SDXL 1024^2 sections cost
# ~300-390 s wall even fully warm (UNet build + PEFT surgery + nnx trace on
# the single core), and the qlora recompile is ~1100-1300 s cold.
SECTIONS = [
    ("nf4_dequant_matmul", bench_nf4_matmul, 30, 120, False),
    ("jit_s_64_fp32_train", bench_jit_s_fp32_scan, 30, 180, False),
    ("jit_b_latent_256_train", bench_jit_latent, 30, 180, False),
    ("flash_attention_s4096", bench_flash_attention, 30, 180, False),
    # e2e decodes in a worker process already; isolate the consumer too so
    # its feed measurement never shares the GIL with earlier sections
    ("jit_b_256_e2e_pipeline", bench_e2e_pipeline, 60, 420, True),
    ("jit_b_latent_e2e", bench_latent_e2e, 40, 300, True),
    ("jit_b_256_sampler", bench_sampler, 40, 300, True),
    ("sdxl_lora_1024_bf16", lambda: bench_sdxl_lora(False), 120, 600, True),
    ("sdxl_qlora_1024_nf4", lambda: bench_sdxl_lora(True), 120, 1320, True),
]

_SECTION_RESULT_MARK = "SECTION_RESULT "


def run_section_subprocess(name: str, timeout_s: float) -> dict:
    """Run one section in a fresh interpreter; parse its JSON result line.
    Returns {"error": ...} / {"skipped": ...} dicts on failure, matching the
    in-process protocol."""
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-m", "vision_pt_tpu.benchmarks", "section",
             name],
            timeout=max(10, timeout_s),
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        return {"skipped": f"subprocess timeout (cap {int(timeout_s)}s)"}
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(_SECTION_RESULT_MARK):
            import json as _json

            return _json.loads(line[len(_SECTION_RESULT_MARK):])
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
    return {
        "error": f"section subprocess rc={proc.returncode}: "
                 f"{(tail[-1] if tail else 'no output')[:200]}"
    }


def _section_fn(name: str):
    for n, fn, _, _, _ in SECTIONS:
        if n == name:
            return fn
    raise KeyError(name)


def section_main(name: str) -> None:
    """Entry for the isolated-section subprocess: compile cache on, run the
    section, emit one marked JSON line."""
    import json as _json
    import sys

    setup_cache()
    try:
        result = _section_fn(name)()
    except Exception as e:  # noqa: BLE001
        first_line = (str(e).splitlines() or [""])[0]
        result = {"error": f"{type(e).__name__}: {first_line[:200]}"}
    print(_SECTION_RESULT_MARK + _json.dumps(result), flush=True)
    sys.stdout.flush()


def warm(names: list[str] | None = None) -> None:
    """Compile-and-run every bench workload with NO alarm, so every backend
    compile's persistent-cache write completes. Isolated sections warm in
    the SAME fresh-subprocess topology the driver uses — that is what keeps
    their persistent-cache keys identical between warm and driver runs."""
    import sys

    setup_cache()
    t0 = time.time()
    todo = [("headline", bench_headline, False)] + [
        (n, f, iso) for n, f, _, _, iso in SECTIONS
    ]
    if names:
        todo = [(n, f, iso) for n, f, iso in todo if n in names]
    for name, fn, isolate in todo:
        t = time.time()
        if isolate:
            result = run_section_subprocess(name, timeout_s=3600)
        else:
            try:
                result = fn()
            except Exception as e:  # noqa: BLE001
                result = f"ERROR {type(e).__name__}: {e}"
        print(f"[warm {int(time.time() - t0)}s] {name} "
              f"({time.time() - t:.0f}s): {result}", file=sys.stderr,
              flush=True)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "warm":
        warm(sys.argv[2:] or None)
    elif len(sys.argv) > 2 and sys.argv[1] == "section":
        section_main(sys.argv[2])
    else:
        print(__doc__)
