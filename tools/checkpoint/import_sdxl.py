"""One-command real-weight SDXL import validation (VERDICT r3 #7).

Given a real single-file SDXL checkpoint (sgm/comfy key layout, e.g.
Illustrious-XL / animagine-xl), this:

1. loads every submodel strict=True through the key converters
   (mirrors reference ``tests/models/test_sdxl.py:154-193``),
2. runs a denoiser forward at 1024^2-latent shape and checks shape/finiteness,
3. generates an image end-to-end and saves it,
4. optionally sweeps the quant matrix (NF4/FP4/INT8/FP8 denoiser cells,
   mirrors ``tools/bench/sdxl_quant.py``) re-generating per cell.

No weights ship in this environment (zero egress); the moment a checkpoint
lands, this is the validation command:

    scripts/inference/import_sdxl.sh /path/to/model.safetensors
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click


@click.command()
@click.option("--checkpoint-path", required=True, type=str)
@click.option("--out-dir", default="./output/import_sdxl", type=str)
@click.option("--prompt", default="1girl, solo, masterpiece, best quality")
@click.option("--negative-prompt", default="worst quality, low quality")
@click.option("--cfg-scale", default=5.0, type=float)
@click.option("--num-inference-steps", default=25, type=int)
@click.option("--height", default=1024, type=int)
@click.option("--width", default=1024, type=int)
@click.option("--seed", default=42, type=int)
@click.option("--quant-matrix", is_flag=True,
              help="also generate with each quantized-denoiser cell")
def main(checkpoint_path, out_dir, prompt, negative_prompt, cfg_scale,
         num_inference_steps, height, width, seed, quant_matrix):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_pt_tpu.models.sdxl import SDXLConfig, SDXLModel

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    report: dict = {"checkpoint": checkpoint_path}

    t0 = time.time()
    config = SDXLConfig(checkpoint_path=checkpoint_path)
    model = SDXLModel.from_checkpoint(config)  # strict=True key coverage
    report["load_strict_s"] = round(time.time() - t0, 1)
    print(f"strict load OK in {report['load_strict_s']}s")

    # denoiser forward at full latent shape (reference test_load_illustrious_xl)
    lat = jax.random.normal(jax.random.key(0), (1, height // 8, width // 8, 4),
                            dtype=jnp.bfloat16)
    ehs = jax.random.normal(jax.random.key(1), (1, 77, 2048),
                            dtype=jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(2), (1, 1280),
                               dtype=jnp.bfloat16)
    sizes = jnp.asarray([[float(height), float(width)]], dtype=jnp.float32)
    crop = jnp.zeros((1, 2), dtype=jnp.float32)
    pred = model.denoiser(lat, jnp.asarray([500.0]), ehs, pooled,
                          sizes, sizes, crop)
    assert pred.shape == lat.shape, (pred.shape, lat.shape)
    assert bool(jnp.isfinite(pred.astype(jnp.float32)).all())
    report["denoiser_forward"] = "ok"
    print("denoiser forward OK", pred.shape)

    def generate(tag: str):
        t = time.time()
        images = model.generate(
            prompt=prompt, negative_prompt=negative_prompt,
            width=width, height=height,
            num_inference_steps=num_inference_steps,
            cfg_scale=cfg_scale, seed=seed,
        )
        path = out / f"{tag}.webp"
        images[0].save(path)
        arr = np.asarray(images[0], dtype=np.float32)
        cell = {"seconds": round(time.time() - t, 1),
                "pixel_std": round(float(arr.std()), 2), "file": str(path)}
        print(f"[{tag}] {cell}")
        return cell

    report["bf16"] = generate("bf16")

    if quant_matrix:
        from vision_pt_tpu.ops.quant import quantize_inplace

        for qt in ("bnb_nf4", "bnb_fp4", "bnb_int8", "fp8_e4m3fn"):
            model = SDXLModel.from_checkpoint(config)  # fresh weights
            quantize_inplace(
                model.denoiser, qt,
                include_keys=["attn1", "attn2", ".ff."],
                exclude_keys=["time_embed", "label_emb"],
            )
            report[qt] = generate(qt)

    with open(out / "report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(f"report: {out / 'report.json'}")


if __name__ == "__main__":
    main()
