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

    def sample(seed):
        out = model.generate(
            prompt=["c1"] * batch, width=256, height=256,
            num_inference_steps=steps, cfg_scale=2.0, seed=seed,
            return_arrays=True,
        )
        return jax.device_get(out)

    sample(0)  # compile
    best = float("inf")
    for trial in range(3):
        t0 = _time.perf_counter()
        sample(trial + 1)  # fresh seed: varies the executed inputs
        best = min(best, (_time.perf_counter() - t0) / steps)
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
    pipeline — on-disk JPEGs -> threaded native C decode
    (native/image_loader.cpp) -> bucket collate -> prefetch thread ->
    device — vs the synthetic resident-array headline (VERDICT r3 item 3;
    reference hot loop: ``src/trainer/common.py:308-374`` eats a torch
    DataLoader with worker decode). Also reports the host-only decode rate
    so host-boundedness is measurable, not assumed: this box has ONE cpu
    core, a production TPU host has dozens.

    Measured decomposition on this box (2026-08-19): device step 545/s,
    tunnel H2D 1.57 GB/s (8 ms/batch, not a bound), single-core decode
    339/s standalone / ~280/s while feeding. e2e lands AT the concurrent
    decode rate => host-decode-bound with 1 core; decode scales ~linearly
    with cores, so >=2 host cores cover the 545/s device rate. The uint8
    feed (4x fewer H2D bytes + no host float conversion) is what makes the
    rest of the pipeline free; the f32 feed number is kept as the naive
    baseline."""
    import time

    import jax
    import jax.numpy as jnp

    from .data import native_image
    from .data.bucket import ConcatBucketDataset, prefetch_iterator
    from .data.text_to_image import TextToImageBucket
    from .models.jit.config import JiT_B_16_Config

    batch, size = 64, 256
    items = _ensure_e2e_image_set()
    bucket = TextToImageBucket(
        items=items, batch_size=batch, width=size, height=size,
        do_upscale=False, seed=0,
    )

    # host-only decode rate (threaded get_batch, no device in the loop)
    for _ in range(2):
        bucket.get_batch(0)  # warm page cache + thread pool
    t0 = time.perf_counter()
    nb = 4
    for bi in range(nb):
        bucket.get_batch(bi)
    host_rate = nb * batch / (time.perf_counter() - t0)

    def batches_forever(bkt, to_dev):
        """Decode AND device_put on the producer thread: the host->device
        transfer is issued `depth` batches ahead, so it overlaps device
        compute instead of serialising between steps (the torch analog is
        DataLoader workers + pin_memory + non_blocking copies)."""
        ds = ConcatBucketDataset([bkt], shuffle=True, seed=0)

        def epochs():
            while True:
                for b in iter(ds):
                    yield to_dev(b)

        return prefetch_iterator(epochs(), depth=3)

    # the EXACT headline training program (same shapes/dtypes -> same
    # executable, warm from the headline section's compile)
    state, pure_step, images, context, key = _jit_train_setup(
        JiT_B_16_Config(), batch, size,
        dtype=jnp.bfloat16, param_dtype=jnp.float32,
    )
    compiled_f32 = pure_step.lower(state, images, context, key).compile()

    # uint8 feed variant: raw RGB8 crosses host->device (4x fewer bytes);
    # the [-1, 1] normalize happens ON DEVICE, fused by XLA into the
    # step's first consumer op
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_u8(state, img_u8, context, key):
        imgs = img_u8.astype(jnp.float32) / 127.5 - 1.0
        return pure_step(state, imgs, context, key)

    img_u8 = jnp.zeros((batch, size, size, 3), dtype=jnp.uint8)
    compiled_u8 = step_u8.lower(state, img_u8, context, key).compile()

    def measure(compiled, it, state):
        state, loss = compiled(state, next(it), context, key)
        float(loss)  # warmup (also drains the first prefetch)
        # pre-fold the per-step keys: over the tunnel every tiny dispatch
        # costs ms of latency; a real trainer folds the key INSIDE the
        # jitted step (trainer.py does), so it must not count here
        keys = [jax.device_put(jax.random.fold_in(key, i))
                for i in range(24)]
        jax.block_until_ready(keys)
        best = float("inf")
        step_i = 0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                state, loss = compiled(
                    state, next(it), context, keys[step_i])
                step_i += 1
            float(loss)  # close the window with a real device sync
            best = min(best, (time.perf_counter() - t0) / 8)
        return best, state

    sec_f32, state = measure(
        compiled_f32,
        batches_forever(
            bucket,
            lambda b: jax.device_put(
                jnp.asarray(b["image"], dtype=jnp.float32)),
        ),
        state,
    )

    bucket_u8 = TextToImageBucket(
        items=items, batch_size=batch, width=size, height=size,
        do_upscale=False, seed=0, output_dtype="uint8",
    )
    sec_u8, state = measure(
        compiled_u8,
        batches_forever(
            bucket_u8, lambda b: jax.device_put(jnp.asarray(b["image"]))),
        state,
    )

    e2e = batch / min(sec_u8, sec_f32)
    return {
        "value": round(e2e, 2),
        "unit": "images/sec/chip (e2e: disk->decode->train, uint8 feed)",
        "e2e_f32_feed_images_per_sec": round(batch / sec_f32, 2),
        "e2e_uint8_feed_images_per_sec": round(batch / sec_u8, 2),
        "host_decode_images_per_sec": round(host_rate, 1),
        "native_loader": bool(native_image.native_available()),
        "num_images": len(items),
        "host_cpu_count": __import__("os").cpu_count(),
        # e2e within 15% of the standalone decode rate => the single host
        # core is the bound, not the device or the feed path
        "host_decode_bound": bool(e2e > 0.85 * host_rate
                                  or host_rate < 1.15 * e2e),
    }


# ------------------------------------------------------------ registry

# (name, fn, floor_s, cap_s): floor = min budget remaining to start the
# section; cap = SIGALRM hard wall-clock cap applied by bench.py. Ordered
# cheapest-first so a short driver window still records the most sections.
# Cap sizing: on the tunneled chip, persistent-cache HITS for 50-80 MB
# executables cost 60-120 s (load/transfer), about as much as a recompile
# (measured 2026-08-17: jit_s hit >90 s with no new cache entry; sdxl_lora
# recompile 354 s vs cache-hit 389 s) — caps cover the slow-load case, and
# the incremental-emit protocol in bench.py tolerates a driver kill inside
# any section.
SECTIONS = [
    ("nf4_dequant_matmul", bench_nf4_matmul, 30, 120),
    ("jit_s_64_fp32_train", bench_jit_s_fp32_scan, 30, 180),
    ("jit_b_latent_256_train", bench_jit_latent, 30, 180),
    # e2e reuses the already-cached headline executable; its cost is jpeg
    # generation (~25 s, /tmp-cached) + host decode in the step loop
    ("jit_b_256_e2e_pipeline", bench_e2e_pipeline, 60, 420),
    ("flash_attention_s4096", bench_flash_attention, 30, 180),
    ("jit_b_256_sampler", bench_sampler, 40, 240),
    # SDXL 1024^2 sections: even with a warm compile cache the Python-side
    # model build + nnx trace of the remat UNet takes ~300-350 s on this
    # one-core host (measured 2026-08-17: lora 389 s wall / 72 s user,
    # cache hit) — caps must cover setup+trace, not just device time.
    ("sdxl_lora_1024_bf16", lambda: bench_sdxl_lora(False), 120, 480),
    # qlora recompiles in ~1100-1300 s (the 560-layer inline-dequant
    # UNet; measured 1267 s warm-run, 1131 s bench-run) and the key
    # instability above means the driver run usually DOES recompile.
    ("sdxl_qlora_1024_nf4", lambda: bench_sdxl_lora(True), 120, 1320),
]


def warm(names: list[str] | None = None) -> None:
    """Compile-and-run every bench workload with NO alarm, so every backend
    compile's persistent-cache write completes. Prints each section result
    (a free measurement record)."""
    import sys

    setup_cache()
    t0 = time.time()
    todo = [("headline", bench_headline)] + [
        (n, f) for n, f, _, _ in SECTIONS
    ]
    if names:
        todo = [(n, f) for n, f in todo if n in names]
    for name, fn in todo:
        t = time.time()
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
    else:
        print(__doc__)
