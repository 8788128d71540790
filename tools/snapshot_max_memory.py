"""Peak device-memory analyzer (rebuild of reference
``tools/snapshot_max_memory.py``, which replays a CUDA allocator pickle).

The TPU analog reads either a ``.memory.prof`` pprof protobuf written by
``jax.profiler.save_device_memory_profile`` or prints live HBM stats from
the attached device."""

import gzip
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import click


def format_bytes(size: float) -> str:
    for unit in ["B", "KB", "MB", "GB", "TB"]:
        if size < 1024:
            return f"{size:.2f} {unit}"
        size /= 1024
    return f"{size:.2f} PB"


def profile_total_bytes(path: str) -> int:
    """Sum the 'space' sample values of a pprof device-memory profile.
    The pprof proto is length-delimited; a minimal varint walk avoids a
    protobuf dependency for the one field we need."""
    raw = Path(path).read_bytes()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    # cheap heuristic fallback: pprof "space" totals are also recoverable via
    # the profile's sample aggregate; use jax's own pprof reader if present
    try:
        from jax.profiler import device_memory_profile  # noqa: F401
    except Exception:
        pass
    total = 0
    i = 0
    # walk top-level fields; field 2 (sample) length-delimited; within sample,
    # field 2 (value) varints — sum the largest-position value as bytes
    def read_varint(buf, pos):
        shift = 0
        val = 0
        while True:
            b = buf[pos]
            val |= (b & 0x7F) << shift
            pos += 1
            if not b & 0x80:
                return val, pos
            shift += 7

    while i < len(raw):
        try:
            key, i = read_varint(raw, i)
        except IndexError:
            break
        field, wire = key >> 3, key & 7
        if wire == 2:
            ln, i = read_varint(raw, i)
            chunk = raw[i:i + ln]
            i += ln
            if field == 2:  # Sample
                j = 0
                vals = []
                while j < len(chunk):
                    skey, j = read_varint(chunk, j)
                    sfield, swire = skey >> 3, skey & 7
                    if swire == 0:
                        v, j = read_varint(chunk, j)
                        if sfield == 2:
                            vals.append(v)
                    elif swire == 2:
                        sln, j = read_varint(chunk, j)
                        j += sln
                    else:
                        break
                if vals:
                    total += vals[-1]
        elif wire == 0:
            _, i = read_varint(raw, i)
        else:
            break
    return total


@click.command()
@click.argument("profile_path", required=False,
                type=click.Path(exists=True))
def main(profile_path: str | None) -> None:
    if profile_path:
        total = profile_total_bytes(profile_path)
        print(f"profiled live bytes: {format_bytes(float(total))}")
        return
    import jax

    for dev in jax.devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if not stats:
            print(f"{dev}: no memory stats available")
            continue
        peak = stats.get("peak_bytes_in_use")
        inuse = stats.get("bytes_in_use")
        limit = stats.get("bytes_limit")
        print(
            f"{dev}: in_use={format_bytes(inuse or 0)} "
            f"peak={format_bytes(peak or 0)} "
            f"limit={format_bytes(limit or 0)}"
        )


if __name__ == "__main__":
    main()
