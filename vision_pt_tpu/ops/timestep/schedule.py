"""Inference timestep schedules (reference ``src/modules/timestep/scheduler.py``)."""

from __future__ import annotations

import numpy as np

from .sampling import get_lin_function


def get_flux_schedule(
    num_steps: int,
    image_seq_len: int,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
    shift: bool = True,
) -> list[float]:
    """Shifted 1 -> 0 schedule with num_steps+1 entries
    (reference ``scheduler.py:6-22``)."""
    timesteps = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float64)
    if shift:
        mu = get_lin_function(y1=base_shift, y2=max_shift)(image_seq_len)
        # time_shift on the host; guard t=0 endpoint (limit is 0)
        with np.errstate(divide="ignore"):
            shifted = np.exp(mu) / (np.exp(mu) + (1.0 / timesteps - 1.0))
        shifted[timesteps == 0.0] = 0.0
        timesteps = shifted
    return [float(t) for t in timesteps]


def get_linear_schedule(
    num_steps: int, start: float = 1.0, end: float = 0.0
) -> np.ndarray:
    """Plain linspace schedule (reference ``scheduler.py:25-33``)."""
    return np.linspace(start, end, num_steps, dtype=np.float32)
