"""Images -> video (rebuild of reference ``src/utils/video.py``)."""

from __future__ import annotations

from typing import Literal

import numpy as np
from PIL import Image


def write_images_as_video(
    images: list[Image.Image],
    output_path: str,
    fps: int,
    codec: Literal["mp4v", "h264", "avc1"] = "mp4v",
) -> None:
    """Reference ``video.py:9-33`` (OpenCV VideoWriter)."""
    import cv2

    width, height = images[0].size
    fourcc = cv2.VideoWriter.fourcc(*codec)
    writer = cv2.VideoWriter(output_path, fourcc, fps, (width, height))
    if not writer.isOpened():
        raise RuntimeError(f"Could not open video writer for {output_path}")
    try:
        for img in images:
            frame = np.asarray(img.convert("RGB"))
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    finally:
        writer.release()
