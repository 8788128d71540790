"""Aspect-ratio bucketing (rebuild of reference
``src/dataset/aspect_ratio_bucket.py``).

Bucket enumeration matches the reference exactly (walk widths down from the
base size, round the paired height to the step, include transposes). Bucket
assignment is vectorized NumPy instead of a Python loop — same semantics:
closest log2 aspect ratio among buckets that fit inside the image
(no-upscale), ties broken toward higher resolution.

Key property for XLA: each bucket yields fixed-shape batches, so the train
step compiles once per bucket resolution (SURVEY §2.2).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
from pydantic import BaseModel

from .bucket import Bucket


def generate_buckets(
    target_area: int = 1024 * 1024,
    start_size: int = 1024,
    step: int = 64,
    min_size: int = 64,
) -> np.ndarray:
    """Enumerate (w, h) pairs near target_area at ``step`` granularity,
    including transposes (reference ``aspect_ratio_bucket.py:20-60``)."""
    buckets: list[np.ndarray] = []
    w = start_size
    while w >= min_size:
        h = round((target_area / w) / step) * step
        if h < min_size:
            break
        buckets.append(np.array([w, h]))
        if w != h:
            buckets.append(np.array([h, w]))
        w -= step
    return np.stack(buckets)


class AspectRatioBucketManager:
    """Assign images to buckets (reference ``aspect_ratio_bucket.py:92-155``)."""

    def __init__(self, buckets: np.ndarray):
        self.buckets = buckets
        self.aspect_ratios = np.log2(buckets[:, 0] / buckets[:, 1])
        self.resolutions = buckets[:, 0] * buckets[:, 1]
        self.sorted_indices = np.argsort(-self.resolutions)

    def __len__(self) -> int:
        return self.buckets.shape[0]

    def __iter__(self):
        for bucket in self.buckets:
            yield bucket[0], bucket[1]

    @staticmethod
    def aspect_ratio(width: int, height: int) -> float:
        return math.log2(width / height)

    def find_nearest(self, width: int, height: int) -> int:
        """Closest-log-AR bucket whose dims fit inside (width, height);
        among equal-AR candidates the highest resolution wins (the reference
        iterates descending resolution and keeps the first strict
        improvement)."""
        fits = (self.buckets[:, 0] <= width) & (self.buckets[:, 1] <= height)
        if not fits.any():
            raise ValueError(f"No bucket found for image size {width}x{height}")
        provided_ar = self.aspect_ratio(width, height)
        diffs = np.abs(self.aspect_ratios - provided_ar)
        # replicate the reference's order: scan by descending resolution,
        # keep first strict minimum
        best_idx, best = None, np.inf
        for idx in self.sorted_indices:
            if not fits[idx]:
                continue
            if diffs[idx] < best:
                best = diffs[idx]
                best_idx = idx
        return int(best_idx)

    def find_nearest_batch(self, widths: np.ndarray, heights: np.ndarray) -> np.ndarray:
        """Vectorized assignment for whole datasets at once."""
        widths = np.asarray(widths)[:, None]
        heights = np.asarray(heights)[:, None]
        fits = (self.buckets[None, :, 0] <= widths) & (
            self.buckets[None, :, 1] <= heights
        )
        ars = np.log2(widths / heights)
        diffs = np.abs(self.aspect_ratios[None, :] - ars)
        # tie-break toward higher resolution (strict-improvement scan order):
        # add a tiny penalty decreasing with resolution rank
        rank = np.empty(len(self.buckets))
        rank[self.sorted_indices] = np.arange(len(self.buckets))
        penalized = np.where(fits, diffs + rank[None, :] * 1e-12, np.inf)
        if (~fits.any(axis=1)).any():
            bad = np.where(~fits.any(axis=1))[0]
            raise ValueError(
                f"{len(bad)} images fit no bucket (first: "
                f"{int(widths[bad[0], 0])}x{int(heights[bad[0], 0])})"
            )
        return np.argmin(penalized, axis=1)

    def print_buckets(self, print_fn=print):
        print_fn("buckets:")
        for bucket in self.buckets:
            print_fn(f"[{bucket[0]}x{bucket[1]}]", end=" ")
        print_fn()


class AspectRatioBucketConfig(BaseModel):
    """Reference ``aspect_ratio_bucket.py:63-89``."""

    batch_size: int = 32
    shuffle: bool = True
    num_workers: int = 8

    bucket_base_size: int = 1024
    step: int = 64
    min_size: int = 384

    @property
    def buckets(self) -> np.ndarray:
        return generate_buckets(
            target_area=self.bucket_base_size**2,
            start_size=self.bucket_base_size,
            step=self.step,
            min_size=self.min_size,
        )


def print_arb_info(buckets: Sequence[Bucket], print_fn=print):
    """Reference ``aspect_ratio_bucket.py:158-170``."""
    print_fn("===== Bucket info =====")
    print_fn(f"=== Number of buckets: {len(buckets)}")
    for idx, bucket in enumerate(buckets):
        print_fn(
            f"Bucket {idx:>3} | {bucket.width:>6,}x{bucket.height:<6,} | "
            f"{bucket.num_items:>8,} images |"
        )
    print_fn("===== End of Bucket info =====")
