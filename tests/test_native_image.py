"""Native C image loader tests (native/image_loader.cpp via ctypes)."""

import numpy as np
import pytest
from PIL import Image

from vision_pt_tpu.data import native_image


@pytest.fixture(scope="module")
def lib_available():
    if not native_image.native_available():
        pytest.skip("native image library unavailable (no g++/libjpeg)")


def _make_image(path, w, h):
    rng = np.random.default_rng(0)
    # smooth gradient + noise: keeps JPEG loss small for comparisons
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
    base = np.concatenate([x + 0 * y, y + 0 * x, (x + y) / 2], axis=-1)
    noise = rng.normal(0, 8, size=(h, w, 3))
    arr = np.clip(base + noise, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path, quality=95)
    return arr


@pytest.mark.parametrize("ext", ["png", "jpg", "webp"])
def test_probe_and_decode_each_format(tmp_path, lib_available, ext):
    path = tmp_path / f"img.{ext}"
    _make_image(path, 320, 200)
    assert native_image.probe_size(path) == (320, 200)
    out = native_image.load_cover_crop(path, 128, 128, 10, 0)
    assert out is not None
    assert out.shape == (128, 128, 3)
    assert out.dtype == np.uint8


def test_cover_crop_matches_pil(tmp_path, lib_available):
    """The C bilinear cover+crop must track PIL's within small tolerance."""
    path = tmp_path / "img.png"
    src = _make_image(path, 300, 180)
    tw, th = 128, 96
    cw, ch = native_image.cover_dims(300, 180, tw, th)
    crop_x, crop_y = 17, 0  # cover dims are (160, 96): no vertical slack
    native = native_image.load_cover_crop(path, tw, th, crop_x, crop_y)
    assert native is not None

    pil = Image.fromarray(src).resize((cw, ch), Image.Resampling.BILINEAR)
    ref = np.asarray(pil)[crop_y:crop_y + th, crop_x:crop_x + tw]
    err = np.abs(native.astype(np.int32) - ref.astype(np.int32))
    assert float(err.mean()) < 2.0
    assert np.percentile(err, 99) <= 6


@pytest.mark.slow
def test_jpeg_scaled_decode_consistency(tmp_path, lib_available):
    """Large JPEG -> small bucket uses DCT-scaled decode; result must stay
    close to the full-resolution PIL pipeline."""
    path = tmp_path / "big.jpg"
    src = _make_image(path, 1600, 1200)
    tw, th = 256, 192
    cw, ch = native_image.cover_dims(1600, 1200, tw, th)
    native = native_image.load_cover_crop(path, tw, th, 0, 0)
    with Image.open(path) as img:
        pil = img.resize((cw, ch), Image.Resampling.BILINEAR)
    ref = np.asarray(pil)[:th, :tw]
    err = np.abs(native.astype(np.int32) - ref.astype(np.int32))
    assert float(err.mean()) < 4.0  # scaled DCT path, slightly different


def test_bucket_uses_native_path(tmp_path, lib_available):
    from vision_pt_tpu.data.text_to_image import TextToImageBucket

    path = tmp_path / "img.jpg"
    _make_image(path, 640, 480)
    bucket = TextToImageBucket(
        items=[{"image": str(path), "caption": "c"}],
        batch_size=1, width=128, height=96, do_upscale=False,
        seed=0, use_native_loader=True,
    )
    item = bucket.load_item(0)
    assert item["image"].shape == (96, 128, 3)
    assert item["image"].dtype == np.float32
    assert item["image"].min() >= -1.0 and item["image"].max() <= 1.0
    # original_size reflects the cover-resized dims, like the PIL path
    cw, ch = native_image.cover_dims(640, 480, 128, 96)
    np.testing.assert_array_equal(item["original_size"], [ch, cw])

    # PIL fallback produces statistically identical output
    bucket_pil = TextToImageBucket(
        items=[{"image": str(path), "caption": "c"}],
        batch_size=1, width=128, height=96, do_upscale=False,
        seed=0, use_native_loader=False,
    )
    item_pil = bucket_pil.load_item(0)
    assert item_pil["image"].shape == item["image"].shape
    # same RNG stream -> same crop offsets
    np.testing.assert_array_equal(
        item["crop_coords_top_left"], item_pil["crop_coords_top_left"]
    )
    # bicubic (PIL path) vs bilinear (C path): close but not identical
    diff = np.abs(item["image"] - item_pil["image"]).mean()
    assert diff < 0.06


@pytest.mark.slow
def test_native_loader_throughput(tmp_path, lib_available):
    """The C path must not be slower than PIL (it should be much faster for
    large JPEGs thanks to scaled decode)."""
    import time

    path = tmp_path / "big.jpg"
    _make_image(path, 2048, 1536)
    tw, th = 256, 192

    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = native_image.load_cover_crop(path, tw, th, 0, 0)
    native_s = time.perf_counter() - t0

    from vision_pt_tpu.data.transforms import ObjectCoverResize

    resize = ObjectCoverResize(tw, th, True)
    t0 = time.perf_counter()
    for _ in range(n):
        with Image.open(path) as img:
            np.asarray(resize(img.convert("RGB")))
    pil_s = time.perf_counter() - t0
    print(f"native {native_s / n * 1e3:.1f}ms vs PIL {pil_s / n * 1e3:.1f}ms")
    assert native_s < pil_s


def test_bucket_uint8_output_mode(tmp_path, lib_available):
    """output_dtype="uint8" emits raw RGB8 (4x fewer host->device bytes;
    the [-1,1] normalize happens on device) that matches the f32 path
    exactly after the on-device formula, on BOTH loader paths."""
    from vision_pt_tpu.data.text_to_image import TextToImageBucket

    path = tmp_path / "img.jpg"
    _make_image(path, 640, 480)
    for use_native in (True, False):
        kw = dict(
            items=[{"image": str(path), "caption": "c"}],
            batch_size=1, width=128, height=96, do_upscale=False,
            seed=0, use_native_loader=use_native,
        )
        item_u8 = TextToImageBucket(**kw, output_dtype="uint8").load_item(0)
        item_f32 = TextToImageBucket(**kw).load_item(0)
        assert item_u8["image"].dtype == np.uint8
        assert item_f32["image"].dtype == np.float32
        np.testing.assert_allclose(
            item_u8["image"].astype(np.float32) / 127.5 - 1.0,
            item_f32["image"], atol=1e-6,
        )
        np.testing.assert_array_equal(
            item_u8["crop_coords_top_left"],
            item_f32["crop_coords_top_left"],
        )
