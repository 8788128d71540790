"""torch .pt/.ckpt -> safetensors conversion (rebuild of reference
``tools/checkpoint/to_safetensors.py``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click


@click.command()
@click.option("--input", "-i", "input_path", type=str, required=True)
@click.option("--output", "-o", "output_path", type=str, required=True)
@click.option("--key", type=str, default=None,
              help="sub-dict key inside the checkpoint (e.g. 'state_dict')")
def main(input_path: str, output_path: str, key: str | None):
    import numpy as np
    import torch
    from safetensors.numpy import save_file

    print("Loading", input_path)
    obj = torch.load(input_path, map_location="cpu", weights_only=True)
    if key is not None:
        obj = obj[key]
    elif isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    tensors = {
        k: np.ascontiguousarray(v.detach().to(torch.float32).numpy())
        if v.dtype in (torch.bfloat16,) else
        np.ascontiguousarray(v.detach().numpy())
        for k, v in obj.items()
        if isinstance(v, torch.Tensor)
    }
    print(f"{len(tensors)} tensors")
    save_file(tensors, output_path)
    print("Saved to", output_path)


if __name__ == "__main__":
    main()
