"""PEFT module-tree surgery (rebuild of reference
``src/modules/peft/functional.py``).

The JAX analog of torch module replacement: walk the NNX object graph,
swap matching ``nnx.Linear`` attributes for adapter layers wrapping the
original. Because adapter params use the ``AdapterParam`` Variable type,
training only adapters is just ``nnx.Optimizer(..., wrt=AdapterParam)``.
"""

from __future__ import annotations

import warnings
from contextlib import contextmanager
from typing import Callable, Iterator, NamedTuple

import numpy as np
from flax import nnx

from .config import PEFT_TYPE, PeftConfigMixin, get_target_keys


class AdapterParam(nnx.Param):
    """Trainable adapter parameter (LoRA/LoHa factors)."""


class PeftConst(nnx.Variable):
    """Non-trainable adapter state (alpha)."""


class PeftLayer(nnx.Module):
    """Base marker for adapter layers (reference ``peft/util.py:10-49``)."""

    adapter_param_names: list[str]
    adapter_weight_names: list[str]
    enabled: bool

    def set_enabled(self, enabled: bool):
        self.enabled = enabled


# ----------------------------------------------------------- graph walking


def iter_named_modules(
    module: nnx.Module, prefix: str = ""
) -> Iterator[tuple[str, nnx.Module]]:
    """(dotted_path, module) over the NNX object graph, depth-first, the
    torch ``named_modules`` analog. Handles nnx.List/nnx.Dict containers."""
    yield prefix.rstrip("."), module
    for name, child in _children(module):
        full = f"{prefix}{name}"
        yield from iter_named_modules(child, f"{full}.")


def _children(module) -> Iterator[tuple[str, nnx.Module]]:
    if isinstance(module, nnx.List):
        for i, item in enumerate(module):
            if isinstance(item, nnx.Module):
                yield str(i), item
        return
    if isinstance(module, nnx.Dict):
        for k, item in module.items():
            if isinstance(item, nnx.Module):
                yield str(k), item
        return
    for name, value in vars(module).items():
        if name.startswith("_"):
            continue
        if isinstance(value, nnx.Module):
            yield name, value


def _set_child(parent, name: str, value):
    if isinstance(parent, nnx.List):
        parent[int(name)] = value
    elif isinstance(parent, nnx.Dict):
        parent[name] = value
    else:
        setattr(parent, name, value)


# ----------------------------------------------------------- replacement


def _make_peft_layer(
    module: nnx.Linear, config: PeftConfigMixin, rngs: nnx.Rngs
) -> PeftLayer:
    from .loha import LoHaLinear
    from .lora import LoRALinear

    if config.type == "lora":
        from .config import LoRAConfig

        return LoRALinear(
            LoRAConfig.model_validate(config.model_dump()), module, rngs=rngs
        )
    if config.type == "loha":
        from .config import LoHaConfig

        return LoHaLinear(
            LoHaConfig.model_validate(config.model_dump()), module, rngs=rngs
        )
    raise ValueError(f"Unknown peft type: {config.type}")


def replace_to_peft_layer(
    model: nnx.Module,
    include_keys,
    exclude_keys,
    config: PeftConfigMixin,
    seed: int = 0,
) -> list[str]:
    """Swap matching Linears for adapter layers in place
    (reference ``functional.py:59-111``). Returns replaced paths."""
    all_paths = [path for path, _ in iter_named_modules(model)]
    target_keys = set(get_target_keys(include_keys, exclude_keys, all_paths))
    rngs = nnx.Rngs(seed)
    replaced: list[str] = []

    def visit(module, prefix: str):
        for name, child in list(_children(module)):
            full = f"{prefix}{name}"
            if isinstance(child, PeftLayer):
                continue
            # QLoRA: quantized linears (QuantLinear4bit/Int8/FP8 expose
            # kernel_shape) take adapters just like plain Linears —
            # reference trains LoRA in bf16 over a quantized base
            # (``src/trainer/common.py:182-201``)
            if isinstance(child, nnx.Linear) or hasattr(child, "kernel_shape"):
                if full in target_keys:
                    _set_child(module, name, _make_peft_layer(child, config, rngs))
                    replaced.append(full)
                continue
            visit(child, f"{full}.")

    visit(model, "")
    return replaced


# ----------------------------------------------------------- state dict


def get_adapter_parameters(model: nnx.Module) -> dict[str, np.ndarray]:
    """Adapter-only state dict in torch/kohya layout
    (reference ``functional.py:114-125``)."""
    out: dict[str, np.ndarray] = {}
    for path, module in iter_named_modules(model):
        if isinstance(module, PeftLayer):
            for key, value in module.get_adapter_weights().items():
                out[f"{path}.{key}" if path else key] = value
    return out


def detect_peft_method(state_dict: dict) -> PEFT_TYPE:
    """Sniff adapter type from checkpoint keys
    (reference ``functional.py:157-162``)."""
    if any(k.endswith(".lora_up.weight") for k in state_dict):
        return "lora"
    if any(k.endswith(".hada_w1_a") for k in state_dict):
        return "loha"
    return "none"


def load_peft_weight(
    model: nnx.Module, state_dict: dict[str, np.ndarray]
) -> list[str]:
    """Replace-or-load adapters driven by checkpoint contents
    (reference ``functional.py:169-233``): existing PeftLayers get weights
    loaded; plain Linears whose path has adapter weights in the checkpoint get
    replaced via ``from_weights``. Returns affected paths."""
    peft_type = detect_peft_method(state_dict)
    if peft_type == "none":
        raise ValueError("Failed to detect peft method from state_dict")
    from .loha import LoHaLinear
    from .lora import LoRALinear

    peft_class = LoRALinear if peft_type == "lora" else LoHaLinear
    affected: list[str] = []

    def visit(module, prefix: str):
        for name, child in list(_children(module)):
            full = f"{prefix}{name}"
            adapter_sd = {
                wn: state_dict.get(f"{full}.{wn}")
                for wn in peft_class.adapter_weight_names
            }
            complete = all(
                v is not None
                for k, v in adapter_sd.items()
                if "bias" not in k
            )
            if isinstance(child, PeftLayer):
                if complete:
                    child.load_weights(adapter_sd)
                    affected.append(full)
                continue
            if isinstance(child, nnx.Linear):
                if complete:
                    _set_child(
                        module, name, peft_class.from_weights(adapter_sd, child)
                    )
                    affected.append(full)
                continue
            visit(child, f"{full}.")

    visit(model, "")
    return affected


# ----------------------------------------------------------- enable/disable


def set_peft_layer_enabled(model: nnx.Module, enabled: bool) -> None:
    for _, module in iter_named_modules(model):
        if isinstance(module, PeftLayer):
            module.set_enabled(enabled)


@contextmanager
def while_peft_disabled(model: nnx.Module):
    """Temporarily bypass adapters (reference ``functional.py:302-330``)."""
    try:
        set_peft_layer_enabled(model, False)
        yield
    finally:
        set_peft_layer_enabled(model, True)


@contextmanager
def while_peft_enabled(model: nnx.Module):
    try:
        set_peft_layer_enabled(model, True)
        yield
    finally:
        set_peft_layer_enabled(model, False)


# ----------------------------------------------------------- reporting


class TrainableParameters(NamedTuple):
    trainable_params: int
    all_param: int
    trainable_percent: float


def calculate_trainable_parameters(
    model: nnx.Module, is_peft: bool | None = None
) -> TrainableParameters:
    """Param counting (reference ``functional.py:243-258``): when adapters are
    present, trainable = AdapterParams; otherwise all Params."""
    all_state = nnx.state(model, nnx.Param)
    all_param = sum(int(np.prod(v.shape)) for v in _leaves(all_state))
    adapter_state = nnx.state(model, AdapterParam)
    adapter_param = sum(int(np.prod(v.shape)) for v in _leaves(adapter_state))
    has_adapters = adapter_param > 0 if is_peft is None else is_peft
    trainable = adapter_param if has_adapters else all_param
    return TrainableParameters(
        trainable_params=trainable,
        all_param=all_param,
        trainable_percent=100.0 * trainable / max(all_param, 1),
    )


def _leaves(state):
    import jax

    return [x for x in jax.tree.leaves(state) if hasattr(x, "shape")]


def human_readable_param(n: int) -> str:
    for unit, value in [("T", 10**12), ("B", 10**9), ("M", 10**6), ("K", 10**3)]:
        if n >= value:
            return f"{n / value:.2f}{unit}"
    return str(n)


def print_trainable_parameters(model: nnx.Module, print_fn: Callable = print):
    tp = calculate_trainable_parameters(model)
    print_fn(
        f"Trainable params: {human_readable_param(tp.trainable_params)}, "
        f"All params: {human_readable_param(tp.all_param)}, "
        f"Trainable%: {tp.trainable_percent:.4f}%"
    )
    if tp.trainable_params == 0:
        warnings.warn("No trainable parameters found — check your peft config")
