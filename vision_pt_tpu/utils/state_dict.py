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


# ----------------------------------------------------- open_clip converters
# (reference ``src/utils/state_dict.py:45-191``)


def _convert_key_open_clip_to_transformers(key: str) -> str:
    key = key.replace(
        "positional_embedding", "embeddings.position_embedding.weight", 1
    )
    key = key.replace("token_embedding", "embeddings.token_embedding", 1)
    key = key.replace("transformer.resblocks", "encoder.layers", 1)
    key = key.replace(".attn.", ".self_attn.", 1)
    key = key.replace(".ln_1.", ".layer_norm1.", 1)
    key = key.replace(".ln_2.", ".layer_norm2.", 1)
    key = key.replace(".mlp.c_fc.", ".mlp.fc1.", 1)
    key = key.replace(".mlp.c_proj.", ".mlp.fc2.", 1)
    key = key.replace("ln_final", "final_layer_norm", 1)
    return key


def _convert_key_transformers_to_open_clip(key: str) -> str:
    key = key.replace(
        "embeddings.position_embedding.weight", "positional_embedding", 1
    )
    key = key.replace("embeddings.token_embedding", "token_embedding", 1)
    key = key.replace("encoder.layers", "transformer.resblocks", 1)
    key = key.replace(".self_attn.", ".attn.", 1)
    key = key.replace(".layer_norm1.", ".ln_1.", 1)
    key = key.replace(".layer_norm2.", ".ln_2.", 1)
    key = key.replace(".mlp.fc1.", ".mlp.c_fc.", 1)
    key = key.replace(".mlp.fc2.", ".mlp.c_proj.", 1)
    key = key.replace("final_layer_norm", "ln_final", 1)
    return key


def convert_open_clip_to_transformers(
    state_dict: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """open_clip layout -> HF transformers layout, including the fused
    in_proj qkv split."""
    new_sd: dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        if "logit_scale" in key:
            continue
        new_sd[_convert_key_open_clip_to_transformers(key)] = np.asarray(value)
    for key in list(new_sd.keys()):
        if re.match(r".*\.in_proj_weight$", key):
            q, k, v = np.split(new_sd.pop(key), 3, axis=0)
            new_sd[key.replace("in_proj_weight", "q_proj.weight")] = q
            new_sd[key.replace("in_proj_weight", "k_proj.weight")] = k
            new_sd[key.replace("in_proj_weight", "v_proj.weight")] = v
        elif re.match(r".*\.in_proj_bias$", key):
            q, k, v = np.split(new_sd.pop(key), 3, axis=0)
            new_sd[key.replace("in_proj_bias", "q_proj.bias")] = q
            new_sd[key.replace("in_proj_bias", "k_proj.bias")] = k
            new_sd[key.replace("in_proj_bias", "v_proj.bias")] = v
    return new_sd


def convert_transformers_to_open_clip(
    state_dict: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    new_sd: dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        if m := re.search(r"(.*)\.(q|k|v)_proj\.(weight|bias)$", key):
            base, which, kind = m.group(1), m.group(2), m.group(3)
            if which != "q":
                continue  # handled once per triple
            fused = np.concatenate(
                [
                    np.asarray(state_dict[f"{base}.q_proj.{kind}"]),
                    np.asarray(state_dict[f"{base}.k_proj.{kind}"]),
                    np.asarray(state_dict[f"{base}.v_proj.{kind}"]),
                ],
                axis=0,
            )
            name = "in_proj_weight" if kind == "weight" else "in_proj_bias"
            new_sd[
                _convert_key_transformers_to_open_clip(f"{base}.{name}")
            ] = fused
        else:
            new_sd[_convert_key_transformers_to_open_clip(key)] = np.asarray(value)
    return new_sd
