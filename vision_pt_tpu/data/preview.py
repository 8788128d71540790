"""Preview-generation job list (rebuild of reference
``src/dataset/preview/text_to_image.py``)."""

from __future__ import annotations

import json
from pathlib import Path

import yaml
from pydantic import BaseModel


class T2IPreviewArgs(BaseModel):
    """One preview generation job (reference ``text_to_image.py:13-24``)."""

    prompt: str
    negative_prompt: str | None = None
    width: int = 256
    height: int = 256
    cfg_scale: float = 2.0
    num_steps: int = 20
    seed: int = 42
    extra: dict = {}


class TextToImagePreviewConfig(BaseModel):
    """YAML/JSON list of preview jobs (reference ``text_to_image.py:26-69``)."""

    path: str | None = None
    data: list[T2IPreviewArgs] = []

    def get_preview_args(self) -> list[T2IPreviewArgs]:
        if self.path is None:
            return self.data
        p = Path(self.path)
        raw = p.read_text()
        if p.suffix in (".yml", ".yaml"):
            items = yaml.safe_load(raw)
        else:
            items = json.loads(raw)
        return [T2IPreviewArgs.model_validate(item) for item in items]
