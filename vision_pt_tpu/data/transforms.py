"""Image transforms (rebuild of reference ``src/dataset/transform.py``),
PIL + NumPy (no torchvision in this environment).

Images flow as NumPy float32 NHWC in [-1, 1].
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def to_array(img: Image.Image) -> np.ndarray:
    """PIL RGB -> HWC float32 in [-1, 1]."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32)
    return arr / 127.5 - 1.0


class ObjectCoverResize:
    """CSS object-fit: cover — scale to fully cover (w, h), keeping aspect
    (reference ``transform.py:11-55``). Crop to exact size is done separately
    (random or center crop)."""

    def __init__(self, width: int, height: int, do_upscale: bool = True):
        self.width = width
        self.height = height
        self.do_upscale = do_upscale

    def __call__(self, img: Image.Image) -> Image.Image:
        w, h = img.size
        scale = max(self.width / w, self.height / h)
        if scale > 1.0 and not self.do_upscale:
            scale = 1.0
        new_w = max(self.width, int(round(w * scale)))
        new_h = max(self.height, int(round(h * scale)))
        return img.resize((new_w, new_h), Image.Resampling.BICUBIC)


class PaddedResize:
    """Letterbox to a square max_size (reference ``transform.py:58-91``)."""

    def __init__(self, max_size: int, fill: int = 255):
        self.max_size = max_size
        self.fill = fill

    def __call__(self, img: Image.Image) -> Image.Image:
        w, h = img.size
        scale = self.max_size / max(w, h)
        new_w, new_h = int(round(w * scale)), int(round(h * scale))
        img = img.resize((new_w, new_h), Image.Resampling.BICUBIC)
        canvas = Image.new("RGB", (self.max_size, self.max_size),
                           (self.fill, self.fill, self.fill))
        canvas.paste(img, ((self.max_size - new_w) // 2, (self.max_size - new_h) // 2))
        return canvas


class ColorChannelSwap:
    """RGB <-> BGR (reference ``transform.py:94-118``)."""

    def __init__(self, swap: tuple[int, int, int] = (2, 1, 0)):
        self.swap = swap

    def __call__(self, arr: np.ndarray) -> np.ndarray:
        return arr[..., list(self.swap)]


def center_crop(arr: np.ndarray, height: int, width: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = (h - height) // 2
    left = (w - width) // 2
    return arr[top : top + height, left : left + width]


def random_crop(
    arr: np.ndarray, height: int, width: int, rng: np.random.Generator
) -> tuple[np.ndarray, tuple[int, int]]:
    """Random crop returning (crop, (top, left)) for SDXL-style size
    conditioning (reference ``text_to_image.py:170-183``)."""
    h, w = arr.shape[:2]
    top = int(rng.integers(0, max(h - height, 0) + 1))
    left = int(rng.integers(0, max(w - width, 0) + 1))
    return arr[top : top + height, left : left + width], (top, left)


def resize_max_side(img: Image.Image, max_size: int) -> Image.Image:
    """Resize so the SHORT side is max_size (torchvision Resize(max_size=...)
    then CenterCrop square semantics used by SquareClassImageBucket)."""
    w, h = img.size
    scale = max_size / min(w, h)
    return img.resize(
        (int(round(w * scale)), int(round(h * scale))), Image.Resampling.BICUBIC
    )
