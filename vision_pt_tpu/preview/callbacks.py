"""Preview callbacks (rebuild of reference ``src/preview/local.py`` and
``src/preview/discord.py``)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from pathlib import Path
from typing import Literal, Union

from PIL import Image
from pydantic import BaseModel


class PreviewCallbackConfig(BaseModel):
    type: str
    save_dir: str


class LocalPreviewCallbackConfig(PreviewCallbackConfig):
    type: Literal["local"] = "local"


class DiscordPreviewCallbackConfig(PreviewCallbackConfig):
    type: Literal["discord"] = "discord"
    webhook_url: str = ""


PreviewCallbackConfigAlias = Union[
    LocalPreviewCallbackConfig, DiscordPreviewCallbackConfig
]


class PreviewCallback(ABC):
    save_name_template: str = "{epoch:05}e_{steps:06}s_{id:03}.webp"

    def __init__(self, save_dir: str | Path, save_name_template: str | None = None):
        self._save_dir = Path(save_dir)
        if save_name_template is not None:
            self.save_name_template = save_name_template

    def get_save_path(self, epoch: int, steps: int, index: int) -> Path:
        return self._save_dir / self.save_name_template.format(
            epoch=epoch, steps=steps, id=index
        )

    @abstractmethod
    def preview(
        self, images: list[Image.Image], epoch: int, steps: int, preview_index: int
    ) -> None:
        ...


class LocalPreviewCallback(PreviewCallback):
    """Write preview images to disk (reference ``src/preview/local.py:10-32``)."""

    def preview(self, images, epoch, steps, preview_index) -> None:
        for i, img in enumerate(images):
            path = self.get_save_path(epoch, steps, preview_index + i)
            path.parent.mkdir(parents=True, exist_ok=True)
            img.save(path)


class DiscordPreviewCallback(LocalPreviewCallback):
    """Save locally then post to a Discord webhook (reference
    ``src/preview/discord.py:23-101``). Post is best-effort."""

    def __init__(self, save_dir, webhook_url: str = "", save_name_template=None):
        super().__init__(save_dir, save_name_template)
        self.webhook_url = webhook_url

    def preview(self, images, epoch, steps, preview_index) -> None:
        super().preview(images, epoch, steps, preview_index)
        if not self.webhook_url:
            return
        try:  # pragma: no cover - network-dependent
            import io

            import requests

            files = {}
            for i, img in enumerate(images):
                buf = io.BytesIO()
                img.save(buf, format="WEBP")
                buf.seek(0)
                files[f"file{i}"] = (f"preview_{i}.webp", buf, "image/webp")
            requests.post(
                self.webhook_url,
                data={"content": f"epoch {epoch}, step {steps}"},
                files=files,
                timeout=30,
            )
        except Exception as e:
            print(f"[preview] Discord post failed (continuing): {e}")


def get_preview_callback(config: PreviewCallbackConfig) -> PreviewCallback:
    kwargs = config.model_dump()
    kind = kwargs.pop("type")
    if kind == "local":
        return LocalPreviewCallback(**kwargs)
    if kind == "discord":
        return DiscordPreviewCallback(**kwargs)
    raise ValueError(f"Unknown preview callback type: {kind}")
