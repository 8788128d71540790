"""Model saving callbacks (rebuild of reference ``src/saving/safetensors.py``
and ``src/saving/hf_hub.py``).

Callbacks receive a torch-layout flat state dict (numpy arrays) so saved
checkpoints interoperate with the reference's format; name template matches
the reference's ``{name}_{epoch:05}e_{steps:06}s.safetensors``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from pathlib import Path
from typing import Literal, Union

import numpy as np
from pydantic import BaseModel


class ModelSavingCallbackConfig(BaseModel):
    type: str
    name: str
    save_dir: str


class SafetensorsSavingCallbackConfig(ModelSavingCallbackConfig):
    type: Literal["safetensors"] = "safetensors"


class HFHubSavingCallbackConfig(ModelSavingCallbackConfig):
    type: Literal["hf_hub"] = "hf_hub"
    repo_id: str = ""
    path_in_repo: str = ""
    private: bool = True


ModelSavingCallbackConfigAlias = Union[
    SafetensorsSavingCallbackConfig, HFHubSavingCallbackConfig
]


class ModelSavingCallback(ABC):
    save_name_template: str = "{name}_{epoch:05}e_{steps:06}s.safetensors"

    def __init__(
        self,
        name: str,
        save_dir: str | Path,
        save_name_template: str | None = None,
    ):
        self.name = name
        self._save_dir = Path(save_dir)
        if save_name_template is not None:
            self.save_name_template = save_name_template

    def get_save_path(self, epoch: int, steps: int) -> Path:
        return self._save_dir / self.save_name_template.format(
            name=self.name, epoch=epoch, steps=steps
        )

    @abstractmethod
    def save(
        self,
        state_dict: dict[str, np.ndarray],
        epoch: int,
        steps: int,
        metadata: dict[str, str] | None = None,
    ) -> Path:
        ...


class SafetensorsSavingCallback(ModelSavingCallback):
    """Write safetensors to disk (reference ``src/saving/safetensors.py:21-36``)."""

    def save(self, state_dict, epoch, steps, metadata=None) -> Path:
        from safetensors.numpy import save_file

        path = self.get_save_path(epoch, steps)
        path.parent.mkdir(parents=True, exist_ok=True)
        save_file(
            {k: np.ascontiguousarray(v) for k, v in state_dict.items()},
            str(path),
            metadata=metadata,
        )
        return path


class HFHubSavingCallback(SafetensorsSavingCallback):
    """Save locally then upload to the HF Hub (reference
    ``src/saving/hf_hub.py:44-62``). Upload is best-effort: failures (e.g. no
    network egress) are logged, not fatal."""

    def __init__(
        self,
        name: str,
        save_dir: str | Path,
        repo_id: str = "",
        path_in_repo: str = "",
        private: bool = True,
        save_name_template: str | None = None,
    ):
        super().__init__(name, save_dir, save_name_template)
        self.repo_id = repo_id
        self.path_in_repo = path_in_repo
        self.private = private

    def save(self, state_dict, epoch, steps, metadata=None) -> Path:
        path = super().save(state_dict, epoch, steps, metadata)
        try:
            from huggingface_hub import HfApi

            api = HfApi()
            api.create_repo(self.repo_id, private=self.private, exist_ok=True)
            api.upload_file(
                path_or_fileobj=str(path),
                path_in_repo=str(Path(self.path_in_repo) / path.name),
                repo_id=self.repo_id,
            )
        except Exception as e:  # pragma: no cover - network-dependent
            print(f"[saving] HF Hub upload failed (continuing): {e}")
        return path


def get_saving_callback(config: ModelSavingCallbackConfig) -> ModelSavingCallback:
    kwargs = config.model_dump()
    kind = kwargs.pop("type")
    if kind == "safetensors":
        return SafetensorsSavingCallback(**kwargs)
    if kind == "hf_hub":
        return HFHubSavingCallback(**kwargs)
    raise ValueError(f"Unknown saving callback type: {kind}")
