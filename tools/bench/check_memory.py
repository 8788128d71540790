"""Device-memory checker (rebuild of reference
``tools/bench/check_memory.py``, which replays CUDA allocator pickles).

TPU analog: run a callable workload (a python expression producing jit work)
and report HBM high-water marks around it."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click


def format_bytes(size: float) -> str:
    for unit in ["B", "KB", "MB", "GB", "TB"]:
        if size < 1024:
            return f"{size:.2f} {unit}"
        size /= 1024
    return f"{size:.2f} PB"


def report(label: str):
    import jax

    for dev in jax.devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if not stats:
            print(f"[{label}] {dev}: no memory stats")
            continue
        print(
            f"[{label}] {dev}: "
            f"in_use={format_bytes(stats.get('bytes_in_use', 0))} "
            f"peak={format_bytes(stats.get('peak_bytes_in_use', 0))} "
            f"limit={format_bytes(stats.get('bytes_limit', 0))}"
        )


@click.command()
@click.option("--expr", type=str, default=None,
              help="python expression to execute between the two reports, "
                   "e.g. 'jnp.zeros((8192, 8192)).block_until_ready()'")
def main(expr: str | None):
    import jax
    import jax.numpy as jnp  # noqa: F401 - available to --expr

    report("before")
    if expr:
        result = eval(expr)  # noqa: S307 - explicit user-supplied probe
        jax.block_until_ready(result)
        report("after")


if __name__ == "__main__":
    main()
