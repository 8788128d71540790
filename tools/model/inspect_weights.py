"""Checkpoint key/shape/dtype dump (rebuild of reference
``tools/model/inspect_weights.py``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click


@click.command()
@click.option("--input", "-i", "input_path", type=str, required=True)
@click.option("--filter", "-f", "key_filter", type=str, default=None)
@click.option("--stats", is_flag=True, help="also print min/max/mean/std")
def main(input_path: str, key_filter: str | None, stats: bool):
    import numpy as np
    from safetensors import safe_open

    total_params = 0
    total_bytes = 0
    with safe_open(input_path, framework="numpy") as f:
        keys = sorted(f.keys())
        for k in keys:
            if key_filter and key_filter not in k:
                continue
            t = f.get_tensor(k)
            total_params += t.size
            total_bytes += t.nbytes
            line = f"{k}  {tuple(t.shape)}  {t.dtype}"
            if stats and np.issubdtype(t.dtype, np.floating):
                line += (f"  min={t.min():.4g} max={t.max():.4g} "
                         f"mean={t.mean():.4g} std={t.std():.4g}")
            print(line)
    print(f"-- {total_params:,} params, {total_bytes / 2**20:.1f} MiB")


if __name__ == "__main__":
    main()
