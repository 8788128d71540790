"""ctypes wrapper for the native image loader (``native/image_loader.cpp``).

Fused decode -> cover-resize -> crop in C, with libjpeg DCT-scaled decoding
(a 4000px JPEG headed for a 1024px bucket decodes at reduced scale instead of
full resolution). Auto-builds the shared library on first use (g++ +
libjpeg/libpng/libwebp, all present in the image) and falls back to PIL
transparently when unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libvptpu_image.so"
_SUPPORTED = (".jpg", ".jpeg", ".png", ".webp")

_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.vptpu_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vptpu_probe.restype = ctypes.c_int
        lib.vptpu_cover_dims.argtypes = [ctypes.c_int] * 4 + [
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vptpu_cover_dims.restype = None
        lib.vptpu_load_cover_crop.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.vptpu_load_cover_crop.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def supports(path: str | Path) -> bool:
    return str(path).lower().endswith(_SUPPORTED)


def probe_size(path: str | Path) -> tuple[int, int] | None:
    """(width, height) without a full decode; None if unsupported."""
    lib = _get_lib()
    if lib is None or not supports(path):
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.vptpu_probe(str(path).encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return w.value, h.value


def cover_dims(src_w: int, src_h: int, target_w: int,
               target_h: int) -> tuple[int, int]:
    """Cover-resize dims, same math as the C side (and ObjectCoverResize)."""
    scale = max(target_w / src_w, target_h / src_h)
    cw = max(int(round(src_w * scale)), target_w)
    ch = max(int(round(src_h * scale)), target_h)
    return cw, ch


def load_cover_crop(path: str | Path, target_w: int, target_h: int,
                    crop_x: int, crop_y: int) -> np.ndarray | None:
    """Decoded + cover-resized + cropped RGB8 (target_h, target_w, 3), or
    None when the native path can't handle the file (caller falls back)."""
    lib = _get_lib()
    if lib is None or not supports(path):
        return None
    out = np.empty((target_h, target_w, 3), dtype=np.uint8)
    rc = lib.vptpu_load_cover_crop(
        str(path).encode(), target_w, target_h, crop_x, crop_y,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out
