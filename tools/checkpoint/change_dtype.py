"""Cast every tensor of a safetensors checkpoint (rebuild of reference
``tools/checkpoint/change_dtype.py``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click


@click.command()
@click.option("--input", "-i", "input_path", type=str, required=True)
@click.option("--output", "-o", "output_path", type=str, required=True)
@click.option("--dtype", type=click.Choice(
    ["float32", "float16", "bfloat16"]), default="bfloat16")
def main(input_path: str, output_path: str, dtype: str):
    # pure host-side cast: ml_dtypes handles bfloat16 without initializing
    # any jax backend (tools must not grab the TPU chip)
    import ml_dtypes
    import numpy as np
    from safetensors.numpy import load_file, save_file

    target = (ml_dtypes.bfloat16 if dtype == "bfloat16"
              else np.dtype(dtype))
    state = load_file(input_path)
    out = {}
    for k, v in state.items():
        if np.issubdtype(v.dtype, np.floating):
            out[k] = v.astype(target)
        else:
            out[k] = v
    save_file(out, output_path)
    print(f"Saved {len(out)} tensors as {dtype} to {output_path}")


if __name__ == "__main__":
    main()
