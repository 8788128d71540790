"""Process-based batch loading (data/worker_pool.py — the torch
DataLoader(num_workers=N) analog, reference ``src/dataloader.py:33-48``)."""

import numpy as np
import pytest

from vision_pt_tpu.data.worker_pool import (
    BatchWorkerPool,
    infinite_indices,
    pool_cpu_budget,
)


def _make_batch(idx: int) -> dict:
    rng = np.random.default_rng(idx)
    return {
        "image": rng.integers(0, 255, size=(4, 8, 8, 3)).astype(np.uint8),
        "sizes": np.full((4, 2), idx, dtype=np.int32),
        "caption": [f"batch {idx} item {i}" for i in range(4)],
    }


def test_order_and_content_match_inline():
    indices = list(range(7))
    expected = [_make_batch(i) for i in indices]
    with BatchWorkerPool(_make_batch, indices, num_workers=2, depth=2) as pool:
        got = []
        for batch, release in pool:
            got.append({k: (v.copy() if isinstance(v, np.ndarray) else v)
                        for k, v in batch.items()})
            release()
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        np.testing.assert_array_equal(g["image"], e["image"])
        np.testing.assert_array_equal(g["sizes"], e["sizes"])
        assert g["caption"] == e["caption"]


def test_iter_device_recycles_slots_and_streams_forever():
    # an infinite index stream must keep producing well past the slot count
    with BatchWorkerPool(
        _make_batch, infinite_indices(3), num_workers=1, depth=2
    ) as pool:
        it = pool.iter_device(lambda b: b["sizes"][0, 0].item())
        seen = [next(it) for _ in range(10)]
    assert seen == [0, 1, 2, 0, 1, 2, 0, 1, 2, 0]
    assert pool.batches_delivered >= 10


def test_worker_error_propagates():
    def bad(idx):
        if idx == 2:
            raise ValueError("decode exploded")
        return _make_batch(idx)

    with BatchWorkerPool(bad, range(4), num_workers=1, depth=2) as pool:
        with pytest.raises(RuntimeError, match="decode exploded"):
            for _, release in pool:
                release()


def test_shape_mismatch_is_loud():
    def varying(idx):
        b = _make_batch(idx)
        if idx == 1:
            b["image"] = b["image"][:2]  # breaks the fixed-shape invariant
        return b

    with BatchWorkerPool(varying, range(3), num_workers=1, depth=2) as pool:
        with pytest.raises(RuntimeError, match="fixed shapes"):
            for _, release in pool:
                release()


def test_real_bucket_batches(tmp_path):
    """The pool must carry a TextToImageBucket's batches bit-identically
    (same decode path the e2e bench and trainer use)."""
    from PIL import Image

    from vision_pt_tpu.data.text_to_image import TextToImageBucket

    items = []
    rng = np.random.default_rng(0)
    for i in range(8):
        arr = rng.integers(0, 255, size=(40, 48, 3)).astype(np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        items.append({"image": str(p), "caption": f"cap {i}"})
    bucket = TextToImageBucket(
        items=items, batch_size=4, width=32, height=32,
        do_upscale=False, seed=0, output_dtype="uint8",
    )
    expected = [bucket.get_batch(0), bucket.get_batch(1)]
    with BatchWorkerPool(
        bucket.get_batch, range(2), num_workers=1, depth=2
    ) as pool:
        for (batch, release), exp in zip(pool, expected):
            np.testing.assert_array_equal(batch["image"], exp["image"])
            assert batch["caption"] == exp["caption"]
            release()


def test_pool_cpu_budget_floor():
    assert pool_cpu_budget() >= 1
