"""Best-effort recorder for measured parity numbers (VERDICT r3 #9).

Parity tests assert generous floors (e.g. sampler PSNR >= 40 dB) so they
stay robust, but the *measured* value is the regression signal — a drop
from 90 dB to 45 dB would pass silently. Tests call :func:`record` after
measuring; the merged JSON lands in ``docs/parity/measured.json`` so each
test run refreshes a reviewable artifact of where parity actually stands.
"""

from __future__ import annotations

import json
import os
import time

_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "parity", "measured.json",
)


def record(key: str, value: float, unit: str = "dB") -> None:
    """Merge {key: {value, unit, at}} into the parity artifact. Never raises
    (a read-only checkout must not fail the parity test itself)."""
    try:
        data = {}
        if os.path.exists(_PATH):
            with open(_PATH) as f:
                data = json.load(f)
        data[key] = {
            "value": float(f"{float(value):.4g}"),  # keep sig figs for tiny errs
            "unit": unit,
            "at": time.strftime("%Y-%m-%d"),
        }
        os.makedirs(os.path.dirname(_PATH), exist_ok=True)
        with open(_PATH, "w") as f:
            json.dump(data, f, indent=2, sort_keys=True)
            f.write("\n")
    except Exception:
        pass
