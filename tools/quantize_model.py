"""Offline checkpoint quantization (rebuild of reference
``tools/quantize_model.py``, retargeted to SDXL — the upstream imports a
removed auraflow package). Packs bnb-format 4-bit / fp8 tensors into a
self-describing safetensors checkpoint that ``replace_by_prequantized_weights``
can load."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import click


@click.command()
@click.option("--model-path", type=str, required=True)
@click.option("--save-path", type=str, required=True)
@click.option("--quant-type", default="bnb_nf4",
              type=click.Choice(["bnb_nf4", "bnb_fp4", "fp8_e4m3fn"]))
@click.option("--include-keys", multiple=True,
              default=["model.diffusion_model."])
@click.option("--exclude-keys", multiple=True,
              default=["time_embed", "label_emb", "out."])
def main(model_path, save_path, quant_type, include_keys, exclude_keys):
    from safetensors.numpy import load_file, save_file

    from vision_pt_tpu.ops.quant import quantize_state_dict

    print("Include keys:", list(include_keys))
    print("Exclude keys:", list(exclude_keys))
    print("Loading state dict from", model_path)
    state_dict = load_file(model_path)
    print(f"Quantizing {quant_type}...")
    out = quantize_state_dict(
        state_dict, quant_type,
        include_keys=list(include_keys), exclude_keys=list(exclude_keys),
    )
    n_quant = sum(1 for k in out if k.endswith(".quant_state.bitsandbytes__" +
                                               quant_type.removeprefix("bnb_")))
    print(f"Quantized tensors: {n_quant}; total keys {len(out)}")
    save_file(out, save_path)
    print("Saved to", save_path)


if __name__ == "__main__":
    main()
