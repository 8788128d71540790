"""ModelForTraining: the workload contract (rebuild of reference
``src/models/for_training.py``).

The lifecycle-hook split between Trainer and ModelForTraining is kept — it's
what lets one Trainer serve every workload. The JAX-specific change: the hot
path is split into a host-side ``prepare_batch`` (tokenization, list->array)
and a pure ``compute_loss(trainable, batch_arrays, key)`` that the Trainer
differentiates and jit-compiles once per bucket shape.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

import jax
import numpy as np
from flax import nnx
from pydantic import BaseModel

from ..config import TrainConfig


class ModelForTraining(ABC):
    model_config: BaseModel
    model_config_class: type[BaseModel]

    _current_step: int = 0

    def __init__(self, config: TrainConfig) -> None:
        self.config = config
        self._logs_at_step: dict = {}
        self._logs_at_epoch: dict[str, list] = {}
        self._is_peft = False
        self._trackers: list = []
        self.validate_config()

    # ------------------------------------------------------------- config

    def validate_config(self):
        self.model_config = self.model_config_class.model_validate(self.config.model)

    def _set_is_peft(self, is_peft: bool):
        self._is_peft = is_peft

    # ------------------------------------------------------------ lifecycle

    def before_setup_model(self):
        pass

    @abstractmethod
    def setup_model(self):
        """Build self.model (pipeline) — construction includes init, so there
        is no separate to_empty/initialize_weights phase as in torch."""

    def after_setup_model(self):
        if self.config.trainer.gradient_checkpointing:
            self.enable_gradient_checkpointing()

    def enable_gradient_checkpointing(self):
        pass

    @abstractmethod
    def sanity_check(self):
        pass

    # ------------------------------------------------------------- training

    @abstractmethod
    def trainable(self) -> nnx.Module:
        """The nnx module tree holding every trainable Param."""

    @abstractmethod
    def prepare_batch(self, batch: dict, key: jax.Array) -> dict:
        """Host-side batch prep (tokenize captions, cast, NHWC). Output must
        be a pytree of arrays with static shapes per bucket."""

    @abstractmethod
    def compute_loss(
        self, trainable: nnx.Module, batch: dict, key: jax.Array
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """Pure loss function — differentiated and jitted by the Trainer."""

    def eval_step(self, batch) -> Any:
        raise NotImplementedError

    def preview_step(self, preview_args, preview_index: int) -> list:
        raise NotImplementedError

    # hooks
    def before_train_step(self):
        self._current_step += 1

    def after_train_step(self):
        self._send_logs_at_step()

    def before_backward(self):
        pass

    def after_backward(self):
        pass

    def before_train_epoch(self):
        pass

    def after_train_epoch(self):
        self._send_logs_at_epoch()

    def before_save_model(self):
        pass

    def after_save_model(self):
        pass

    def before_preview(self):
        pass

    def after_preview(self):
        pass

    # ------------------------------------------------------------- saving

    def get_state_dict_to_save(self) -> dict[str, np.ndarray]:
        if hasattr(self.model, "state_dict"):
            return self.model.state_dict()
        raise NotImplementedError

    def get_metadata_to_save(self) -> dict[str, str]:
        return {}

    # ------------------------------------------------------------- logging

    def print(self, *args, **kwargs):
        print(*args, **kwargs)

    def log(self, name: str, value, on_step: bool = True, on_epoch: bool = False):
        """Buffer a metric (reference ``for_training.py:171-189``). Cross-rank
        mean-reduce happens naturally: metrics coming out of the jitted step
        are already replicated means under data-parallel sharding.

        Device values are buffered as-is and only fetched at flush time
        (``_send_logs_at_step``): an eager float() here would sync the
        async dispatch pipeline on every metric of every step."""
        if on_step:
            self._logs_at_step[name] = value
        if on_epoch:
            self._logs_at_epoch.setdefault(name, []).append(value)

    @staticmethod
    def _to_float(value):
        if hasattr(value, "item") or hasattr(value, "block_until_ready"):
            return float(np.asarray(value).mean())
        return value

    def _send_logs_at_step(self):
        if self._logs_at_step:
            fetched = {k: self._to_float(v) for k, v in self._logs_at_step.items()}
            for tracker in self._trackers:
                tracker.log(fetched, step=self._current_step)
        self._logs_at_step = {}

    def _send_logs_at_epoch(self):
        for name, values in self._logs_at_epoch.items():
            values = [self._to_float(v) for v in values]
            if values and isinstance(values[0], (int, float)):
                for tracker in self._trackers:
                    tracker.log(
                        {f"{name}_epoch": sum(values) / len(values)},
                        step=self._current_step,
                    )
        self._logs_at_epoch = {}
