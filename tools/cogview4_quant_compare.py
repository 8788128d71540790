"""CogView4 dense-vs-quantized comparison (rebuild of reference
``tools/cogview4_quant_compare.py``): generate the same prompt/seed across
quantization settings and report per-pair PSNR + wall time + HBM peak."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import click
import numpy as np


def quantize_model(model, text_encoder: str, denoiser: str):
    """Reference ``cogview4_quant_compare.py:15-52`` target keys."""
    from vision_pt_tpu.ops.quant import quantize_inplace

    if text_encoder != "bf16":
        quantize_inplace(
            model, quant_type=text_encoder,
            include_keys=["q_proj", "k_proj", "v_proj", "o_proj",
                          "mlp.down_proj", "mlp.gate_up_proj"],
            exclude_keys=["denoiser.", "vae."],
        )
    if denoiser != "bf16":
        quantize_inplace(
            model, quant_type=denoiser,
            include_keys=["to_q", "to_k", "to_v", "to_out", "ff."],
            exclude_keys=["time_condition_embed", "patch_embed", "norm_out",
                          "proj_out", "norm1", "text_encoder.", "vae."],
        )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


@click.command()
@click.option("--model_path", type=str, required=True)
@click.option("--prompt", default="a photo of a cat wearing a tiny hat")
@click.option("--height", default=512, type=int)
@click.option("--width", default=512, type=int)
@click.option("--num_inference_steps", default=20, type=int)
@click.option("--cfg_scale", default=5.0, type=float)
@click.option("--seed", default=42, type=int)
@click.option("--denoiser_quants", default="bf16,bnb_nf4,bnb_int8")
@click.option("--save_dir", default="./output/cogview4_quant_compare")
def main(model_path, prompt, height, width, num_inference_steps, cfg_scale,
         seed, denoiser_quants, save_dir):
    from vision_pt_tpu.models.cogview4 import CogView4Config, CogView4Model

    out_dir = Path(save_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    quants = denoiser_quants.split(",")

    results = {}
    reference_pixels = None
    for quant in quants:
        model = CogView4Model.from_checkpoint(
            CogView4Config(checkpoint_path=model_path, dtype="bfloat16")
        )
        quantize_model(model, "bf16", quant)
        start = time.perf_counter()
        image = model.generate(
            prompt=prompt, height=height, width=width,
            num_inference_steps=num_inference_steps, cfg_scale=cfg_scale,
            seed=seed,
        )[0]
        elapsed = time.perf_counter() - start
        pixels = np.asarray(image)
        if reference_pixels is None:
            reference_pixels = pixels
        image.save(out_dir / f"denoiser-{quant}.webp")
        import jax

        stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
        results[quant] = {
            "seconds": round(elapsed, 3),
            "psnr_vs_bf16": round(psnr(reference_pixels, pixels), 2),
            "peak_hbm_bytes": stats.get("peak_bytes_in_use") if stats else None,
        }
        print(quant, results[quant])
        del model

    with open(out_dir / "results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
