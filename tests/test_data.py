import numpy as np
from PIL import Image

from vision_pt_tpu.data.bucket import Bucket, BucketDataset, ConcatBucketDataset
from vision_pt_tpu.data.caption import (
    CaptionDrop,
    CaptionPrefix,
    CaptionShuffle,
    CaptionShuffleInGroup,
    CaptionSuffix,
    CaptionTagDrop,
    CaptionReplace,
    apply_caption_processors,
)
from vision_pt_tpu.data.square_class_image import SyntheticClassImageDatasetConfig
from vision_pt_tpu.data.transforms import (
    ObjectCoverResize,
    PaddedResize,
    center_crop,
    random_crop,
)


def test_bucket_modulo_repeat():
    b = Bucket([{"x": i} for i in range(3)], batch_size=2, num_repeats=2)
    assert len(b) == 6
    assert b.get_item(4) == {"x": 1}
    ds = BucketDataset(b)
    assert len(ds) == 3
    batch = ds[0]
    assert batch["x"] == [0, 1]


def test_concat_bucket_dataset_shuffle_and_host_shard():
    b1 = Bucket([{"x": i} for i in range(4)], batch_size=2)
    b2 = Bucket([{"x": i + 10} for i in range(2)], batch_size=2)
    ds = ConcatBucketDataset([b1, b2], shuffle=True, seed=0)
    assert len(ds) == 3
    batches = list(ds)
    assert len(batches) == 3
    # host sharding splits batches
    ds0 = ConcatBucketDataset([b1, b2], shuffle=False, host_index=0, host_count=2)
    ds1 = ConcatBucketDataset([b1, b2], shuffle=False, host_index=1, host_count=2)
    assert len(ds0) + len(ds1) == 3


def test_iter_from_index_level_skip():
    """Mid-epoch resume: iter_from(k) yields exactly the tail of the epoch
    stream and never loads (decodes) the skipped batches."""
    loaded = []

    class CountingBucket(Bucket):
        def load_item(self, idx):
            loaded.append(idx)
            return super().load_item(idx)

    def make():
        b1 = CountingBucket([{"x": i} for i in range(6)], batch_size=2)
        b2 = CountingBucket([{"x": i + 10} for i in range(4)], batch_size=2)
        ds = ConcatBucketDataset([b1, b2], shuffle=True, seed=0)
        ds.set_epoch(3)
        return ds

    full = [b["x"] for b in make()]
    loaded.clear()
    tail = [b["x"] for b in make().iter_from(2)]
    assert tail == full[2:]
    # only the tail's items were ever loaded: 3 batches x 2 items
    assert len(loaded) == 2 * len(tail)


def test_caption_processors():
    rng = np.random.default_rng(0)
    assert CaptionPrefix(prefix="a, ")("b") == "a, b"
    assert CaptionSuffix(suffix=", z")("b") == "b, z"
    assert CaptionReplace(source="x", target="y")("axb") == "ayb"
    assert CaptionDrop(drop_rate=1.0)("text", rng) == ""
    assert CaptionDrop(drop_rate=0.0)("text", rng) == "text"
    assert CaptionTagDrop(drop_rate=1.0)("a,b,c", rng) == ""
    shuffled = CaptionShuffle()("a, b, c", rng)
    assert sorted(shuffled.split(", ")) == ["a", "b", "c"]
    grouped = CaptionShuffleInGroup()("a, b ||| c, d", rng)
    parts = grouped.split(", ")
    assert set(parts[:2]) == {"a", "b"} and set(parts[2:]) == {"c", "d"}
    out = apply_caption_processors(
        "x", [CaptionPrefix(prefix="p "), CaptionSuffix(suffix=" s")], rng
    )
    assert out == "p x s"


def test_object_cover_resize():
    img = Image.new("RGB", (100, 50))
    out = ObjectCoverResize(60, 60)(img)
    assert out.size[1] == 60 and out.size[0] >= 60
    # no upscale
    small = Image.new("RGB", (30, 30))
    out2 = ObjectCoverResize(60, 60, do_upscale=False)(small)
    assert out2.size == (60, 60)  # still padded up to target by min clamp


def test_padded_resize_letterbox():
    img = Image.new("RGB", (100, 50), (0, 0, 0))
    out = PaddedResize(64, fill=255)(img)
    assert out.size == (64, 64)
    arr = np.asarray(out)
    assert arr[0, 0].tolist() == [255, 255, 255]  # padding
    assert arr[32, 32].tolist() == [0, 0, 0]  # image content


def test_crops():
    arr = np.arange(5 * 6 * 1, dtype=np.float32).reshape(5, 6, 1)
    c = center_crop(arr, 3, 4)
    assert c.shape == (3, 4, 1)
    rng = np.random.default_rng(0)
    r, (top, left) = random_crop(arr, 3, 4, rng)
    assert r.shape == (3, 4, 1)
    assert 0 <= top <= 2 and 0 <= left <= 2


def test_synthetic_dataset_batches():
    cfg = SyntheticClassImageDatasetConfig(
        num_classes=3, num_items=8, image_size=16, batch_size=4
    )
    ds = cfg.get_dataset()
    assert len(ds) == 2
    for batch in ds:
        assert batch["image"].shape == (4, 16, 16, 3)
        assert batch["image"].dtype == np.float32
        assert len(batch["caption"]) == 4
        assert batch["image"].min() >= -1.0 and batch["image"].max() <= 1.0
    # determinism: same item content across epochs
    b1 = next(iter(cfg.get_dataset()))
    b2 = next(iter(cfg.get_dataset()))
    np.testing.assert_array_equal(b1["image"], b2["image"])
