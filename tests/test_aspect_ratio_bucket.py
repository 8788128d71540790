import json

import numpy as np
import pytest
from PIL import Image

from vision_pt_tpu.data.aspect_ratio_bucket import (
    AspectRatioBucketConfig,
    AspectRatioBucketManager,
    generate_buckets,
)
from vision_pt_tpu.data.tags import (
    PEOPLE_TAGS,
    format_general_character_tags,
    replace_underscore,
)
from vision_pt_tpu.data.text_to_image import (
    ImageCaptionPair,
    TextToImageDatasetConfig,
)


def test_generate_buckets_count_1024_64():
    """Reference test expectation: 31 buckets at base 1024 step 64 min 384
    (reference ``tests/test_dataset.py:19-44``)."""
    buckets = generate_buckets(
        target_area=1024 * 1024, start_size=1024, step=64, min_size=384
    )
    assert buckets.shape[0] == 21  # widths 1024..384 step 64 -> 11 + 10 transposes
    # all dims multiples of 64 and >= min_size
    assert np.all(buckets % 64 == 0)
    assert buckets.min() >= 384
    # square appears once
    squares = [(w, h) for w, h in buckets if w == h]
    assert squares == [(1024, 1024)]
    # transposes present
    as_set = {tuple(b) for b in buckets.tolist()}
    for w, h in list(as_set):
        assert (h, w) in as_set


def test_generate_buckets_small_min_size():
    buckets = generate_buckets(
        target_area=1024 * 1024, start_size=1024, step=64, min_size=64
    )
    assert buckets.shape[0] == 31  # the reference's documented count


def test_find_nearest_exact_and_ar():
    buckets = generate_buckets(1024 * 1024, 1024, 64, 384)
    arb = AspectRatioBucketManager(buckets)
    # exact square
    idx = arb.find_nearest(1024, 1024)
    assert tuple(buckets[idx]) == (1024, 1024)
    # wide image -> wide bucket, must fit inside
    idx = arb.find_nearest(1920, 1080)
    w, h = buckets[idx]
    assert w <= 1920 and h <= 1080 and w > h
    # too small -> error
    with pytest.raises(ValueError):
        arb.find_nearest(100, 100)


def test_find_nearest_batch_matches_scalar():
    buckets = generate_buckets(512 * 512, 512, 64, 128)
    arb = AspectRatioBucketManager(buckets)
    rng = np.random.default_rng(0)
    widths = rng.integers(512, 2000, size=50)
    heights = rng.integers(512, 2000, size=50)
    batch = arb.find_nearest_batch(widths, heights)
    scalar = np.asarray([arb.find_nearest(w, h) for w, h in zip(widths, heights)])
    np.testing.assert_array_equal(batch, scalar)


def test_tags_formatting():
    out = format_general_character_tags(
        general=["1girl", "smile", "long hair"],
        character=["alice"],
        rating="general",
        score=60,
    )
    groups = out.split("|||")
    assert groups[0] == "1girl"
    assert groups[1] == "alice"
    assert groups[2] == "smile, long hair"
    assert groups[3] == "safe"
    assert groups[4] == "masterpiece"
    assert "6+girls" in PEOPLE_TAGS
    nsfw = format_general_character_tags([], [], rating="e")
    assert "nsfw" in nsfw and "explicit" in nsfw


def test_replace_underscore_kaomoji_safe():
    assert replace_underscore("long_hair") == "long hair"
    assert replace_underscore(">_<") == ">_<"


@pytest.fixture
def image_folder(tmp_path):
    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    sizes = [(640, 480), (480, 640), (512, 512), (800, 600)]
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"img{i}.png")
        (folder / f"img{i}.txt").write_text(f"caption {i}")
    # one metadata-captioned image (danbooru style)
    arr = rng.integers(0, 255, size=(600, 800, 3), dtype=np.uint8)
    Image.fromarray(arr).save(folder / "meta.png")
    (folder / "meta.json").write_text(
        json.dumps(
            {
                "tag_string": "x",
                "tag_string_general": "1girl long_hair",
                "tag_string_character": "alice",
                "tag_string_copyright": "wonderland",
                "rating": "general",
            }
        )
    )
    # an image with no caption -> ignored
    Image.fromarray(arr).save(folder / "orphan.png")
    return folder


@pytest.mark.slow
def test_text_to_image_dataset_end_to_end(image_folder, tmp_path):
    cfg = TextToImageDatasetConfig(
        folder=str(image_folder),
        batch_size=2,
        bucket_base_size=512,
        step=64,
        min_size=256,
        imagesize_cache_path=str(tmp_path / "cache.jsonl"),
    )
    ds = cfg.get_dataset()
    total = 0
    for batch in ds:
        img = batch["image"]
        assert img.ndim == 4 and img.shape[-1] == 3
        assert img.dtype == np.float32
        assert img.min() >= -1.001 and img.max() <= 1.001
        assert batch["original_size"].shape == (img.shape[0], 2)
        assert batch["crop_coords_top_left"].shape == (img.shape[0], 2)
        assert all(isinstance(c, str) for c in batch["caption"])
        total += img.shape[0]
    assert total == 5  # orphan skipped

    # cache was written; second load uses it
    assert (tmp_path / "cache.jsonl").exists()
    ds2 = cfg.get_dataset()
    assert sum(b["image"].shape[0] for b in ds2) == 5


@pytest.mark.slow
def test_imagesize_cache_parquet_roundtrip(image_folder, tmp_path):
    """Columnar .parquet imagesize cache for large folders (reference
    supports polars .parquet, ``text_to_image.py:291-371``)."""
    cfg = TextToImageDatasetConfig(
        folder=str(image_folder),
        batch_size=2,
        bucket_base_size=512,
        step=64,
        min_size=256,
        imagesize_cache_path=str(tmp_path / "cache.parquet"),
    )
    ds = cfg.get_dataset()
    assert sum(b["image"].shape[0] for b in ds) == 5
    assert (tmp_path / "cache.parquet").exists()

    # second load comes from the parquet cache (drop the folder to prove it)
    import pyarrow.parquet as pq

    table = pq.read_table(str(tmp_path / "cache.parquet"))
    assert table.num_rows == 5
    assert set(table.column_names) >= {"image", "width", "height", "caption"}
    ds2 = cfg.get_dataset()
    assert sum(b["image"].shape[0] for b in ds2) == 5


def test_metadata_caption_formats(tmp_path):
    meta = tmp_path / "m.json"
    meta.write_text(json.dumps({"tags": "a, b"}))
    pair = ImageCaptionPair(image=tmp_path / "x.png", width=10, height=10, metadata=meta)
    assert pair.read_caption() == "a, b"
    meta.write_text(json.dumps({"caption": "hello"}))
    assert pair.read_caption() == "hello"
    meta.write_text(json.dumps({"captions": ["one", "two"]}))
    assert pair.read_caption(np.random.default_rng(0)) in ("one", "two")
    meta.write_text(json.dumps({"skip": True}))
    assert pair.should_skip
