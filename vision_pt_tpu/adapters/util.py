"""Adapter framework (rebuild of reference ``src/modules/adapter/util.py``).

An Adapter replaces a module matched by a ``target_key`` regex; the
AdapterManager performs the graph surgery, keeps the replaced modules in a
dict keyed by escaped paths ('.' -> '!', the reference's checkpoint
convention), and (de)serializes adapter-only weights.
"""

from __future__ import annotations

import re
from abc import abstractmethod

import numpy as np
from flax import nnx

from ..peft.config import RegexMatch
from ..peft.functional import _children, _set_child, iter_named_modules

class Adapter(nnx.Module):
    """Base adapter (reference ``util.py:13-32``)."""

    target_key: RegexMatch

    @classmethod
    def from_module(cls, module: nnx.Module, config, **kwargs) -> "Adapter":
        raise NotImplementedError

    def get_module_dict(self) -> dict[str, nnx.Module]:
        """Reference API parity; serialization uses get_adapter_state."""
        return {}

    @abstractmethod
    def get_adapter_state(self) -> dict[str, np.ndarray]:
        ...

    @abstractmethod
    def load_adapter_state(self, sd: dict[str, np.ndarray]) -> None:
        ...


class AdapterManager(nnx.Module):
    """Reference ``util.py:35-87``."""

    def __init__(self, adapter_class: type[Adapter], adapter_config):
        self.module_dict = nnx.Dict()
        self.adapter_class = adapter_class
        self.adapter_config = adapter_config

    def apply_adapter(self, model: nnx.Module, **from_module_kwargs) -> list[str]:
        """Replace every module whose path matches the adapter's target_key;
        returns the replaced paths."""
        pattern = re.compile(self.adapter_class.target_key.regex)
        replaced: list[str] = []

        def visit(module, prefix: str):
            for name, child in list(_children(module)):
                full = f"{prefix}{name}"
                if isinstance(child, Adapter):
                    continue
                if pattern.match(full):
                    adapter = self.adapter_class.from_module(
                        child, self.adapter_config, **from_module_kwargs
                    )
                    _set_child(module, name, adapter)
                    self.module_dict[full.replace(".", "!")] = adapter
                    replaced.append(full)
                    continue
                visit(child, f"{full}.")

        visit(model, "")
        return replaced

    def get_state_dict(self) -> dict[str, np.ndarray]:
        """Adapter-only weights under escaped-path keys
        ('.' -> '!' except the parameter suffix; reference ``util.py:56-67``)."""
        out: dict[str, np.ndarray] = {}
        for key, adapter in self.module_dict.items():
            for pkey, value in adapter.get_adapter_state().items():
                out[f"{key}.{pkey}"] = np.asarray(value)
        return out

    def load_adapter_state(self, state_dict: dict[str, np.ndarray]) -> None:
        for key, adapter in self.module_dict.items():
            prefix = f"{key}."
            sub = {
                k[len(prefix):]: v for k, v in state_dict.items()
                if k.startswith(prefix)
            }
            if sub:
                adapter.load_adapter_state(sub)
