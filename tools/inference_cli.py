"""CLI image generation with optional quantization (rebuild of reference
``tools/inference_cli.py`` — upstream imports a removed auraflow package; the
shape is the spec, retargeted to SDXL).

On TPU the whole sampler jits into one program per (shape, steps); no
torch.compile/offload machinery is needed — HBM fits SDXL.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import click


@click.command()
@click.option("--checkpoint-path", required=True, type=str)
@click.option("--prompt", default="photo of a cat", type=str)
@click.option("--negative-prompt", default="blurry, ugly, low quality")
@click.option("--width", default=768, type=int)
@click.option("--height", default=768, type=int)
@click.option("--num-inference-steps", default=20, type=int)
@click.option("--cfg-scale", default=5.0, type=float)
@click.option("--seed", default=42, type=int)
@click.option("--save-path", default="output.webp", type=str)
@click.option("--quant-type", default=None,
              type=click.Choice(["bnb_nf4", "bnb_fp4", "bnb_int8",
                                 "quanto_int8", "fp8_e4m3fn"]))
@click.option("--max-token-length", default=225, type=int)
def main(checkpoint_path, prompt, negative_prompt, width, height,
         num_inference_steps, cfg_scale, seed, save_path, quant_type,
         max_token_length):
    from vision_pt_tpu.models.sdxl import SDXLConfig, SDXLModel
    from vision_pt_tpu.ops.quant import quantize_inplace

    config = SDXLConfig(checkpoint_path=checkpoint_path)
    print("Loading model...")
    model = SDXLModel.from_checkpoint(config)
    if quant_type is not None:
        print(f"Quantizing model with {quant_type}...")
        quantize_inplace(
            model.denoiser, quant_type,
            include_keys=["attn", "ff", "proj_in", "proj_out"],
            exclude_keys=["time_embed", "label_emb", "out_"],
        )
    print("Model loaded")
    print(f"Prompt: {prompt}\nSize: {width}x{height} "
          f"steps={num_inference_steps} cfg={cfg_scale} seed={seed}")

    images = model.generate(
        prompt=prompt,
        negative_prompt=negative_prompt,
        width=width,
        height=height,
        num_inference_steps=num_inference_steps,
        cfg_scale=cfg_scale,
        seed=seed,
        max_token_length=max_token_length,
    )
    images[0].save(save_path)
    print(f"Saved to {save_path}")


if __name__ == "__main__":
    main()
