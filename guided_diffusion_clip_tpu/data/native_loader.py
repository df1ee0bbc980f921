"""ctypes bindings for the native C++ data-loader core (native/gdc_loader.cpp).

The C library does JPEG/PNG decode + BOX/bicubic resize + crop/flip/[-1,1]
normalization for a whole batch in one call (internal std::thread pool; the
GIL is released for the duration). The Python pipeline keeps ordering,
img2/CLIP pairing, and sharding.

Opt-in (`load_data(..., native=True)` or GDC_NATIVE_LOADER=1). The C++
resampler replicates Pillow's fixed-point resample algorithm exactly (both
BOX and antialiased BICUBIC), so output pixels are BIT-IDENTICAL to the PIL
path — pinned by tests/test_native_loader.py, including JPEG decode (same
system libjpeg). Builds on demand with `make -C native`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO, "native", "libgdc_loader.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO, "native")],
            check=True, capture_output=True, timeout=300,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        raise OSError("native loader unavailable (build failed; see native/Makefile)")
    lib = ctypes.CDLL(_SO_PATH)
    lib.gdc_process_image.restype = ctypes.c_int
    lib.gdc_process_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.gdc_process_batch.restype = ctypes.c_int
    lib.gdc_process_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load_library()
        return True
    except OSError:
        return False


def process_batch(
    paths: Sequence[str],
    image_size: int,
    *,
    random_crop: bool = False,
    random_flip: bool = True,
    seeds: Sequence[int] | None = None,
    num_threads: int = 0,
):
    """Decode+preprocess a batch natively.

    Returns (batch f32 [N, S, S, 3] in [-1,1], flipped uint8 [N]). Raises on
    any decode failure (corrupt/unsupported file).
    """
    lib = load_library()
    n = len(paths)
    out = np.empty((n, image_size, image_size, 3), np.float32)
    flipped = np.zeros((n,), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if seeds is None:
        seeds = np.arange(1, n + 1, dtype=np.uint64)
    c_seeds = np.ascontiguousarray(seeds, dtype=np.uint64)
    ok = lib.gdc_process_batch(
        c_paths, n, image_size, int(random_crop), int(random_flip),
        c_seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        flipped.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    if ok != n:
        raise IOError(f"native loader processed {ok}/{n} images")
    return out, flipped
