"""State-dict utilities: flatten NNX module state to dotted keys and back.

The TPU analog of the reference's ``src/utils/state_dict.py`` key plumbing:
checkpoints are safetensors files with PyTorch-style dotted keys so they
interoperate with the reference's checkpoints (per-model converters handle
layout differences like Linear transposes and conv reshapes).
"""

from __future__ import annotations

import re
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def _path_to_key(path: tuple) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def flatten_state(module: nnx.Module) -> dict[str, jax.Array]:
    """nnx module -> {dotted.path: array} over all Params."""
    state = nnx.state(module, nnx.Param)
    flat = nnx.to_flat_state(state)
    out = {}
    for path, value in flat:
        out[_path_to_key(tuple(path))] = value.value if hasattr(value, "value") else value
    return out


def load_flat_state(
    module: nnx.Module,
    flat: dict[str, jax.Array],
    strict: bool = True,
) -> list[str]:
    """Load {dotted.path: array} into an nnx module in place.

    Returns the list of module keys that were NOT found in ``flat`` (empty
    when strict and everything matched; raises on mismatch when strict).
    """
    current = flatten_state(module)
    missing = [k for k in current if k not in flat]
    unexpected = [k for k in flat if k not in current]
    if strict and (missing or unexpected):
        raise KeyError(
            f"state mismatch: missing={missing[:10]}{'...' if len(missing) > 10 else ''} "
            f"unexpected={unexpected[:10]}{'...' if len(unexpected) > 10 else ''}"
        )

    state = nnx.state(module, nnx.Param)
    flat_state = dict(nnx.to_flat_state(state))
    new_items = []
    for path, variable in flat_state.items():
        key = _path_to_key(tuple(path))
        if key in flat:
            arr = jnp.asarray(flat[key])
            expected = variable.value.shape if hasattr(variable, "value") else None
            if expected is not None and tuple(arr.shape) != tuple(expected):
                raise ValueError(
                    f"shape mismatch for {key}: checkpoint {arr.shape} vs model {expected}"
                )
            variable = variable.replace(arr.astype(variable.value.dtype))
        new_items.append((path, variable))
    nnx.update(module, nnx.from_flat_state(new_items))
    return missing


def get_target_keys(
    keys: list[str],
    include_patterns: list[str],
    exclude_patterns: list[str] | None = None,
) -> list[str]:
    """Include/exclude key matching, string-contains or regex
    (reference ``src/utils/state_dict.py:15-42``)."""

    def matches(key: str, pattern: str) -> bool:
        if pattern in key:
            return True
        try:
            return re.search(pattern, key) is not None
        except re.error:
            return False

    out = []
    for key in keys:
        if not any(matches(key, p) for p in include_patterns):
            continue
        if exclude_patterns and any(matches(key, p) for p in exclude_patterns):
            continue
        out.append(key)
    return out


def convert_keys(
    flat: dict[str, np.ndarray],
    rules: list[tuple[str, str]],
) -> dict[str, np.ndarray]:
    """Apply (regex, replacement) renames in order; first match wins."""
    out = {}
    for key, value in flat.items():
        new_key = key
        for pattern, repl in rules:
            if re.search(pattern, key):
                new_key = re.sub(pattern, repl, key)
                break
        out[new_key] = value
    return out
