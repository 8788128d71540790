"""SDXL quantization x resolution bench (rebuild of reference
``tools/bench/sdxl_quant.py``): per-cell image + wall time + device memory.

TPU changes vs the reference: CUDA allocator snapshots are replaced by
``device.memory_stats()`` peak bytes where libtpu exposes them. On the
remote-tunneled chip used here memory_stats returns nothing (and the runtime
memory profiler segfaults over the tunnel), so the recorded
``static_denoiser_step_hbm`` is XLA's STATIC memory analysis of the compiled
CFG-doubled denoiser forward only — a per-submodule bound, NOT the measured
pipeline peak. "offload" maps to the layerwise pinned-host strategy rather
than .to('cpu') ping-pong."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click

DEFAULT_PROMPT = (
    "1girl, aqua eyes, baseball cap, blonde hair, closed mouth, earrings, "
    "green background, hat, hoop earrings, jewelry, looking at viewer, "
    "shirt, short hair, simple background, solo, upper body, yellow shirt, "
    "masterpiece"
)
DEFAULT_NEGATIVE = (
    "lowres, bad anatomy, bad hands, text, error, missing finger, cropped, "
    "worst quality, low quality, signature, watermark, username, blurry"
)


def quantize_model(model, text_encoder: str, denoiser: str):
    """Reference ``sdxl_quant.py:15-32``."""
    from vision_pt_tpu.ops.quant import quantize_inplace

    if text_encoder != "bf16":
        quantize_inplace(
            model, quant_type=text_encoder,
            include_keys=["self_attn", ".mlp."],
            exclude_keys=["denoiser.", "vae."],
        )
    if denoiser != "bf16":
        quantize_inplace(
            model, quant_type=denoiser,
            include_keys=["attn1", "attn2", ".ff."],
            exclude_keys=["text_encoder.", "vae."],
        )


def device_memory_bytes() -> int | None:
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats:
        return stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
    return None


def get_run_name(text_encoder: str, denoiser: str, skip_offload: bool) -> str:
    return (f"text-encoder-{text_encoder}_denoiser-{denoiser}"
            f"_offload-{not skip_offload}")


@click.command()
@click.option("--model_path", default="./models/animagine-xl-4.0-opt.safetensors")
@click.option("--text_encoder", default="bf16", type=str)
@click.option("--denoiser", default="bf16", type=str)
@click.option("--skip_offload", is_flag=True)
@click.option("--prompt", default=DEFAULT_PROMPT)
@click.option("--height", default=1024, type=int)
@click.option("--width", default=1024, type=int)
@click.option("--cfg_scale", default=5.0, type=float)
@click.option("--num_inference_steps", default=25, type=int)
@click.option("--seed", default=42, type=int)
@click.option("--save_dir", default="./output/bench/sdxl_quant")
def main(model_path, text_encoder, denoiser, skip_offload, prompt, height,
         width, cfg_scale, num_inference_steps, seed, save_dir):
    import jax

    from vision_pt_tpu.models.sdxl import SDXLConfig, SDXLModel

    run_name = get_run_name(text_encoder, denoiser, skip_offload)
    out_dir = Path(save_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    model = SDXLModel.from_checkpoint(
        SDXLConfig(checkpoint_path=model_path, dtype="bfloat16")
    )
    quantize_model(model, text_encoder, denoiser)

    def run():
        return model.generate(
            prompt=prompt, negative_prompt=DEFAULT_NEGATIVE,
            height=height, width=width, cfg_scale=cfg_scale,
            num_inference_steps=num_inference_steps, seed=seed,
        )[0]

    run()  # compile warmup
    start = time.perf_counter()
    image = run()
    elapsed = time.perf_counter() - start

    peak = device_memory_bytes()
    static_mem = None
    if peak is None:
        # remote-tunneled TPUs expose neither memory_stats nor the runtime
        # memory profiler (it segfaults over the axon tunnel); record XLA's
        # static memory analysis of the hot compiled program instead — the
        # CFG-doubled denoiser forward dominates peak HBM
        import jax.numpy as jnp
        from flax import nnx

        from vision_pt_tpu.utils.memory import (
            compiled_memory_analysis,
            format_bytes,
        )

        b = 2  # CFG doubled batch of 1
        lat_h, lat_w = height // 8, width // 8
        den_step = nnx.jit(
            lambda den, lat, t, ehs, pooled, sz, crop: den(
                lat, t, ehs, pooled, sz, sz, crop
            )
        )
        static_mem = compiled_memory_analysis(
            den_step, model.denoiser,
            jnp.zeros((b, lat_h, lat_w, 4), dtype=jnp.bfloat16),
            jnp.zeros((b,), dtype=jnp.float32),
            jnp.zeros((b, 154, 2048), dtype=jnp.bfloat16),
            jnp.zeros((b, 1280), dtype=jnp.bfloat16),
            jnp.full((b, 2), float(height), dtype=jnp.float32),
            jnp.zeros((b, 2), dtype=jnp.float32),
        )
        if static_mem:
            print(
                "static denoiser-step HBM: "
                f"{format_bytes(static_mem['total_bytes'])}"
            )

    image.save(out_dir / f"{run_name}.webp")
    record = {
        "run": run_name, "height": height, "width": width,
        "steps": num_inference_steps, "seconds": round(elapsed, 3),
        "peak_hbm_bytes": peak,
        "static_denoiser_step_hbm": static_mem,
    }
    print(json.dumps(record))
    with open(out_dir / f"{run_name}.json", "w") as f:
        json.dump(record, f)


if __name__ == "__main__":
    main()
