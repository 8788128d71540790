"""Quantization flows (rebuild of reference ``src/modules/quant/functional.py``):

(a) ``replace_to_quant_linear`` — swap Linears before loading
(b) ``quantize_inplace`` — quantize already-loaded weights
(c) ``replace_by_prequantized_weights`` — sniff quant-state keys in a
    checkpoint and swap matching layers, then load
(d) ``quantize_state_dict`` — offline checkpoint quantization
"""

from __future__ import annotations

from typing import Literal

import numpy as np
from flax import nnx

from ...peft.config import get_target_keys
from ...peft.functional import _children, _set_child, iter_named_modules
from .layers import QuantLinear4bit, QuantLinearFP8, QuantLinearInt8
from .nf4 import quantize_4bit, state_to_bnb_dict

QUANT_TYPE = Literal[
    "fp8_e4m3fn",
    "bnb_int8",
    "bnb_fp4",
    "bnb_nf4",
    "quanto_int4",
    "quanto_int8",
    "ao_nf4",
    "ao_fp8",
]

_FOUR_BIT = {"bnb_fp4": "fp4", "bnb_nf4": "nf4", "ao_nf4": "nf4",
             "quanto_int4": "nf4"}
_INT8 = {"bnb_int8", "quanto_int8"}
_FP8 = {"fp8_e4m3fn", "ao_fp8"}


def _quantize_linear(linear: nnx.Linear, quant_type: QUANT_TYPE):
    if quant_type in _FOUR_BIT:
        return QuantLinear4bit.from_linear(
            linear, quant_type=_FOUR_BIT[quant_type]
        )
    if quant_type in _INT8:
        return QuantLinearInt8.from_linear(linear)
    if quant_type in _FP8:
        return QuantLinearFP8.from_linear(linear)
    raise ValueError(f"Unknown quant type: {quant_type}")


def quantize_inplace(
    model: nnx.Module,
    quant_type: QUANT_TYPE,
    include_keys: list[str],
    exclude_keys: list[str] = [],
) -> list[str]:
    """Quantize loaded Linears matching the key patterns
    (reference ``functional.py:238-253``). Returns replaced paths."""
    paths = [p for p, _ in iter_named_modules(model)]
    targets = set(get_target_keys(include_keys, exclude_keys, paths))
    replaced = []

    def visit(module, prefix: str):
        for name, child in list(_children(module)):
            full = f"{prefix}{name}"
            if isinstance(child, nnx.Linear):
                if full in targets:
                    _set_child(module, name, _quantize_linear(child, quant_type))
                    replaced.append(full)
                continue
            visit(child, f"{full}.")

    visit(model, "")
    return replaced


# alias matching the reference's pre-load flow; with NNX there's no
# empty-weights phase so both flows are the same surgery
replace_to_quant_linear = quantize_inplace


def detect_quant_type(
    children: dict[str, np.ndarray],
) -> QUANT_TYPE | None:
    """Sniff quant type from a layer's weight.* child keys
    (reference ``functional.py:277-300``)."""
    for key, tensor in children.items():
        if "quant_state" in key:
            qt = key.split("bitsandbytes__")[-1]
            if qt == "nf4":
                return "bnb_nf4"
            if qt == "fp4":
                return "bnb_fp4"
        elif "weight_format" in key:
            return "bnb_int8"
        elif "_data" in key:
            return (
                "quanto_int8"
                if np.asarray(tensor).dtype == np.int8
                else "quanto_int4"
            )
    return None


def replace_by_prequantized_weights(
    model: nnx.Module, state_dict: dict[str, np.ndarray]
) -> list[str]:
    """Swap Linears whose checkpoint entries carry quant-state keys, loading
    the packed weights (reference ``functional.py:303-339``)."""
    replaced = []

    def visit(module, prefix: str):
        for name, child in list(_children(module)):
            full = f"{prefix}{name}"
            if isinstance(child, nnx.Linear):
                children_sd = {
                    k[len(full) + len(".weight."):]: v
                    for k, v in state_dict.items()
                    if k.startswith(f"{full}.weight.")
                }
                if not children_sd:
                    continue
                quant_type = detect_quant_type(children_sd)
                if quant_type is None:
                    continue
                in_features, out_features = child.kernel.value.shape
                if quant_type in _FOUR_BIT:
                    q = QuantLinear4bit(
                        in_features, out_features,
                        use_bias=child.bias is not None,
                    )
                    q.load_prequantized(
                        state_dict[f"{full}.weight"],
                        children_sd,
                        bias=state_dict.get(f"{full}.bias"),
                    )
                elif quant_type in _INT8:
                    q = QuantLinearInt8(in_features, out_features,
                                        use_bias=child.bias is not None)
                    import jax.numpy as jnp

                    q.qweight.value = jnp.asarray(
                        state_dict[f"{full}.weight"], dtype=jnp.int8
                    )
                    scale = children_sd.get("SCB", children_sd.get("_scale"))
                    if scale is not None:
                        q.scale.value = jnp.asarray(
                            np.asarray(scale, dtype=np.float32).reshape(-1)
                        )
                else:
                    continue
                _set_child(module, name, q)
                replaced.append(full)
                continue
            visit(child, f"{full}.")

    visit(model, "")
    return replaced


def quantize_state_dict(
    state_dict: dict[str, np.ndarray],
    quant_type: QUANT_TYPE,
    include_keys: list[str],
    exclude_keys: list[str] = [],
) -> dict[str, np.ndarray]:
    """Offline checkpoint quantization (reference ``functional.py:342-371``);
    torch-layout (out, in) weights in, bnb-format packed tensors out."""
    if quant_type not in ("bnb_nf4", "bnb_fp4", "fp8_e4m3fn"):
        raise NotImplementedError(
            "Only bnb 4-bit and fp8_e4m3fn offline quantization is supported"
        )
    targets = set(
        get_target_keys(include_keys, exclude_keys, list(state_dict.keys()))
    )
    out = dict(state_dict)
    for key in list(out.keys()):
        if key not in targets or not key.endswith(".weight"):
            continue
        if quant_type in ("bnb_nf4", "bnb_fp4"):
            packed, state = quantize_4bit(
                np.asarray(out[key], dtype=np.float32),
                quant_type=quant_type[len("bnb_"):],
            )
            out[key] = packed
            for sk, sv in state_to_bnb_dict(state).items():
                out[f"{key}.{sk}"] = sv
        else:  # fp8: stored as-is in ml_dtypes fp8
            import ml_dtypes

            out[key] = np.asarray(out[key]).astype(ml_dtypes.float8_e4m3fn)
    return out
