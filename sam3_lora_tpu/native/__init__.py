"""Native (C++) host-data-path kernels, loaded via ctypes.

The reference's host data path leans on native code (pycocotools' C RLE
codec; decord/torchcodec for video). This package provides the TPU build's
equivalent: a small C++ library compiled on first use with the system
toolchain and bound with ctypes (no pybind11 dependency). Every entry point
has a pure-numpy fallback in :mod:`sam3_lora_tpu.ops.rle`, so the framework
works even without a compiler; ``available()`` reports which path is live.

Compile cache: ``librle.so`` next to the source; rebuilt when the source is
newer (mtime) or the load fails.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger("sam3_lora_tpu")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rle.cpp")
_LIB = os.path.join(_DIR, "librle.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # no compiler / sandboxed build dir
        log.debug("native rle build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    needs_build = not os.path.exists(_LIB) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    )
    if needs_build and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB)

    i64 = ctypes.c_int64
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.rle_encode_counts.argtypes = [u8p, i64, i64p]
    lib.rle_encode_counts.restype = i64
    lib.rle_decode_counts.argtypes = [i64p, i64, u8p, i64]
    lib.rle_counts_to_string.argtypes = [i64p, i64, ctypes.c_char_p]
    lib.rle_counts_to_string.restype = i64
    lib.rle_string_to_counts.argtypes = [ctypes.c_char_p, i64, i64p]
    lib.rle_string_to_counts.restype = i64
    lib.rle_string_decode.argtypes = [ctypes.c_char_p, i64, u8p, i64]
    lib.downsample_mask_exact.argtypes = [f32p, i64, i64, i64, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# --------------------------------------------------------------------------
# numpy-facing wrappers (same semantics as ops/rle.py fallbacks)
# --------------------------------------------------------------------------


def rle_encode(mask: np.ndarray) -> dict:
    """(H, W) {0,1} mask -> COCO compressed RLE dict (native path)."""
    lib = _load()
    assert lib is not None
    h, w = mask.shape
    flat = np.ascontiguousarray(
        np.asarray(mask, np.uint8).flatten(order="F")
    )
    counts = np.empty(flat.size + 2, np.int64)
    # the C encoder emits the leading zero-run itself (val starts at 0)
    n = int(lib.rle_encode_counts(flat, flat.size, counts)) if flat.size else 0
    view = np.ascontiguousarray(counts[:n])
    buf = ctypes.create_string_buffer(8 * max(n, 1))
    m = lib.rle_counts_to_string(view, n, buf)
    return {"size": [int(h), int(w)], "counts": buf.raw[:m].decode("ascii")}


def rle_decode(rle: dict) -> np.ndarray:
    """COCO RLE dict -> (H, W) uint8 mask (native fused path)."""
    lib = _load()
    assert lib is not None
    h, w = rle["size"]
    total = h * w
    flat = np.zeros(total, np.uint8)
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        s = counts.encode("ascii") if isinstance(counts, str) else counts
        lib.rle_string_decode(s, len(s), flat, total)
    else:
        c = np.ascontiguousarray(np.asarray(counts, np.int64))
        lib.rle_decode_counts(c, len(c), flat, total)
    return flat.reshape((h, w), order="F")


def downsample_mask_exact(mask: np.ndarray, out: int) -> Optional[np.ndarray]:
    """Exact-factor area downsample + 0.5 threshold; None if not exact."""
    lib = _load()
    h, w = mask.shape
    if lib is None or h % out or w % out:
        return None
    src = np.ascontiguousarray(mask, np.float32)
    dst = np.empty((out, out), np.float32)
    lib.downsample_mask_exact(src, h, w, out, dst)
    return dst
