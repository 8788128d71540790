"""Device-memory introspection that works on remote-tunneled TPUs.

The reference records CUDA allocator snapshots
(``/root/reference/tools/bench/sdxl_quant.py:99,134``). On TPU the live
equivalents (``device.memory_stats()``, the device memory profiler) are
unavailable over the axon tunnel (stats return None; the profiler
segfaults), so the bench matrix records **XLA's static memory analysis**
of the compiled executable instead: exact compile-time peak HBM for the
program (temp + arguments + outputs), which is what determines whether a
config fits the chip.
"""

from __future__ import annotations

from typing import Any


def live_peak_bytes() -> int | None:
    """Runtime peak from memory_stats(), when the platform exposes it."""
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats:
        return stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
    return None


def compiled_memory_analysis(jitted_fn, *args, **kwargs) -> dict[str, int] | None:
    """Static HBM accounting of a jitted function at the given example args:
    {argument, output, temp, alias, total} bytes. ``jitted_fn`` must expose
    ``.lower()`` (jax.jit / nnx.jit both do)."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        ma = compiled.memory_analysis()
        if ma is None:
            return None
        arg = int(getattr(ma, "argument_size_in_bytes", 0))
        out = int(getattr(ma, "output_size_in_bytes", 0))
        temp = int(getattr(ma, "temp_size_in_bytes", 0))
        alias = int(getattr(ma, "alias_size_in_bytes", 0))
        return {
            "argument_bytes": arg,
            "output_bytes": out,
            "temp_bytes": temp,
            "alias_bytes": alias,
            # aliased output buffers reuse argument space — don't double count
            "total_bytes": arg + out + temp - alias,
        }
    except Exception:
        return None


def format_bytes(n: int | None) -> str:
    if n is None:
        return "n/a"
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024:
            return f"{n:.2f} {unit}"
        n /= 1024
    return f"{n:.2f} TiB"


def peak_hbm_record(jitted_fn=None, *args: Any, **kwargs: Any) -> dict:
    """Best-available memory record: live stats if the platform has them,
    else the static analysis of ``jitted_fn`` at ``args``."""
    record: dict[str, Any] = {"live_peak_bytes": live_peak_bytes()}
    if jitted_fn is not None:
        record["static"] = compiled_memory_analysis(jitted_fn, *args, **kwargs)
    return record
