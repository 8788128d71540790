"""Layer-group offloading: HBM <-> host memory swapping during forward.

TPU-native rebuild of reference ``src/modules/offload.py``: the reference
swaps layer groups between GPU and CPU at group heads; here params move
between device HBM and pinned host memory via JAX memory kinds. On backends
without pinned_host support this degrades to a no-op.

Note: on TPU the usually-better memory lever is rematerialization
(gradient checkpointing) — offload exists for inference-time HBM ceilings
(e.g. the reference's quant-bench matrix with offload on/off).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import NamedTuple, Sequence

import jax
from flax import nnx


class GroupOffloadArgs(NamedTuple):
    layer_indices: list[int]
    to_host: bool


def _supports_pinned_host() -> bool:
    try:
        from jax.sharding import SingleDeviceSharding

        d = jax.devices()[0]
        SingleDeviceSharding(d, memory_kind="pinned_host")
        return d.platform == "tpu"
    except Exception:
        return False


def _move_module(module: nnx.Module, to_host: bool) -> None:
    from jax.sharding import SingleDeviceSharding

    device = jax.devices()[0]
    kind = "pinned_host" if to_host else "device"
    sharding = SingleDeviceSharding(device, memory_kind=kind)
    state = nnx.state(module)

    def place(x):
        if isinstance(x, jax.Array):
            return jax.device_put(x, sharding)
        return x

    nnx.update(module, jax.tree.map(place, state))


class LayerwiseOffloadStrategy:
    """Group-of-layers schedule (reference ``offload.py:15-89``): at each
    group's first layer, the previous group moves to host and the new group
    to HBM."""

    def __init__(
        self,
        layer_groups: Sequence[Sequence[int]],
        enabled: bool | None = None,
    ):
        group_starts = [group[0] for group in layer_groups]
        total = sum(len(g) for g in layer_groups)
        self.offload_args: list[tuple[GroupOffloadArgs, GroupOffloadArgs] | None]
        self.offload_args = [None] * total
        for i, (start, group) in enumerate(zip(group_starts, layer_groups)):
            previous = list(layer_groups[i - 1]) if i > 0 else []
            self.offload_args[start] = (
                GroupOffloadArgs(previous, to_host=True),
                GroupOffloadArgs(list(group), to_host=False),
            )
        self.layer_groups = layer_groups
        self.enabled = _supports_pinned_host() if enabled is None else enabled

    @classmethod
    def from_num_groups(cls, num_layers: int, num_groups: int,
                        **kw) -> "LayerwiseOffloadStrategy":
        per = -(-num_layers // num_groups)
        groups = [
            list(range(i, min(i + per, num_layers)))
            for i in range(0, num_layers, per)
        ]
        return cls(groups, **kw)

    def should_offload(self, layer_idx: int) -> bool:
        return self.offload_args[layer_idx] is not None

    def maybe_offload_layers(self, layers: Sequence[nnx.Module],
                             current_index: int) -> None:
        if not self.enabled or not self.should_offload(current_index):
            return
        prev_group, next_group = self.offload_args[current_index]
        for idx in prev_group.layer_indices:
            _move_module(layers[idx], to_host=True)
        for idx in next_group.layer_indices:
            _move_module(layers[idx], to_host=False)

    def offload_all(self, layers: Sequence[nnx.Module]) -> None:
        if not self.enabled:
            return
        for layer in layers:
            _move_module(layer, to_host=True)


class OffloadableModuleMixin:
    """Reference ``offload.py:92-149``."""

    offload_strategy: LayerwiseOffloadStrategy | None = None

    def set_offload_strategy(self, strategy: LayerwiseOffloadStrategy | None):
        self.offload_strategy = strategy

    def maybe_offload_by_group(self, layers: Sequence[nnx.Module],
                               current_index: int) -> None:
        if self.offload_strategy is not None:
            self.offload_strategy.maybe_offload_layers(layers, current_index)

    @contextmanager
    def while_offloaded(self, layers: Sequence[nnx.Module]):
        """Park all groups on the host for the scope, restoring on exit."""
        if self.offload_strategy is None:
            yield
            return
        try:
            self.offload_strategy.offload_all(layers)
            yield
        finally:
            for layer in layers:
                _move_module(layer, to_host=False)
