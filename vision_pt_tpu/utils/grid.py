"""Preview image grid (rebuild of reference ``src/utils/grid.py``)."""

from __future__ import annotations

import math

import numpy as np
from PIL import Image


def images_to_grid_image(images: list[Image.Image], padding: int = 2,
                         fill: int = 0) -> Image.Image:
    """Tile images into a roughly square grid (torchvision make_grid analog;
    reference ``grid.py:9-35``)."""
    n = len(images)
    assert n > 0
    ncol = max(int(n ** 0.5), 1)
    nrow = math.ceil(n / ncol)
    w = max(img.width for img in images)
    h = max(img.height for img in images)
    canvas = np.full(
        (nrow * (h + padding) + padding, ncol * (w + padding) + padding, 3),
        fill, dtype=np.uint8,
    )
    for i, img in enumerate(images):
        r, c = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = c * (w + padding) + padding
        arr = np.asarray(img.convert("RGB"))
        canvas[y:y + arr.shape[0], x:x + arr.shape[1]] = arr
    return Image.fromarray(canvas)
