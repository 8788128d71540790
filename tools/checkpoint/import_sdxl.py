"""One-command real-weight SDXL import validation (VERDICT r3 #7).

Given a single-file SDXL checkpoint (sgm/comfy key layout, e.g.
Illustrious-XL / animagine-xl), this:

1. loads every submodel strict=True through the key converters
   (mirrors reference ``tests/models/test_sdxl.py:154-193``),
2. runs a denoiser forward at full-latent shape and checks shape/finiteness,
3. generates an image end-to-end and saves it,
4. optionally sweeps the quant matrix (NF4/FP4/INT8/FP8 denoiser cells,
   mirrors ``tools/bench/sdxl_quant.py``) re-generating per cell.

No real weights ship in this environment (zero egress), but the exact
format path is proven on a synthetic reference-keyed checkpoint:
``tests/models/test_sdxl_import.py`` builds a random-init checkpoint whose
sgm keys come from the TORCH REFERENCE's own converters, then drives
``run_import`` below end-to-end (strict load -> generate -> quant matrix).
The moment a real checkpoint lands:

    scripts/inference/import_sdxl.sh /path/to/model.safetensors
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click


def run_import(
    config,
    out_dir: str,
    *,
    prompt: str = "1girl, solo, masterpiece, best quality",
    negative_prompt: str = "worst quality, low quality",
    cfg_scale: float = 5.0,
    num_inference_steps: int = 25,
    height: int = 1024,
    width: int = 1024,
    seed: int = 42,
    quant_matrix: bool = False,
    quant_types=("bnb_nf4", "bnb_fp4", "bnb_int8", "fp8_e4m3fn"),
    attach_tokenizers=None,
    execution_dtype=None,
) -> dict:
    """Strict-load -> forward -> generate (-> quant matrix) on a checkpoint.

    ``config`` is an ``SDXLConfig`` whose ``checkpoint_path`` points at an
    sgm-format safetensors file; tiny research configs pass overridden
    ``denoiser``/``vae_config``/``text_encoder_*_config`` and inject mock
    tokenizers via ``attach_tokenizers(model)``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_pt_tpu.models.sdxl import SDXLModel

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    report: dict = {"checkpoint": config.checkpoint_path}

    def load_model():
        model = SDXLModel.from_checkpoint(config)  # strict=True key coverage
        if attach_tokenizers is not None:
            attach_tokenizers(model)
        return model

    t0 = time.time()
    model = load_model()
    report["load_strict_s"] = round(time.time() - t0, 1)
    print(f"strict load OK in {report['load_strict_s']}s")

    # denoiser forward at full latent shape (reference test_load_illustrious_xl)
    fwd_dtype = execution_dtype or jnp.bfloat16
    context_dim = model.denoiser.config.context_dim
    lat = jax.random.normal(jax.random.key(0), (1, height // 8, width // 8, 4),
                            dtype=fwd_dtype)
    ehs = jax.random.normal(jax.random.key(1), (1, 77, context_dim),
                            dtype=fwd_dtype)
    pooled = jax.random.normal(jax.random.key(2), (1, 1280), dtype=fwd_dtype)
    sizes = jnp.asarray([[float(height), float(width)]], dtype=jnp.float32)
    crop = jnp.zeros((1, 2), dtype=jnp.float32)
    pred = model.denoiser(lat, jnp.asarray([500.0]), ehs, pooled,
                          sizes, sizes, crop)
    assert pred.shape == lat.shape, (pred.shape, lat.shape)
    assert bool(jnp.isfinite(pred.astype(jnp.float32)).all())
    report["denoiser_forward"] = "ok"
    print("denoiser forward OK", pred.shape)

    def generate(tag: str, gen_model):
        t = time.time()
        kw = {}
        if execution_dtype is not None:
            kw["execution_dtype"] = execution_dtype
        images = gen_model.generate(
            prompt=prompt, negative_prompt=negative_prompt,
            width=width, height=height,
            num_inference_steps=num_inference_steps,
            cfg_scale=cfg_scale, seed=seed, **kw,
        )
        path = out / f"{tag}.webp"
        images[0].save(path)
        arr = np.asarray(images[0], dtype=np.float32)
        cell = {"seconds": round(time.time() - t, 1),
                "pixel_std": round(float(arr.std()), 2), "file": str(path)}
        print(f"[{tag}] {cell}")
        return cell

    report["bf16"] = generate("bf16", model)

    if quant_matrix:
        from vision_pt_tpu.ops.quant import quantize_inplace

        for qt in quant_types:
            qmodel = load_model()  # fresh weights
            quantize_inplace(
                qmodel.denoiser, qt,
                include_keys=["attn1", "attn2", ".ff."],
                exclude_keys=["time_embed", "label_emb"],
            )
            report[qt] = generate(qt, qmodel)

    with open(out / "report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(f"report: {out / 'report.json'}")
    return report


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
    from vision_pt_tpu.models.sdxl import SDXLConfig

    run_import(
        SDXLConfig(checkpoint_path=checkpoint_path),
        out_dir,
        prompt=prompt,
        negative_prompt=negative_prompt,
        cfg_scale=cfg_scale,
        num_inference_steps=num_inference_steps,
        height=height,
        width=width,
        seed=seed,
        quant_matrix=quant_matrix,
    )


if __name__ == "__main__":
    main()
