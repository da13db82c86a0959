"""ctypes loader for the C RLE codec (see rle.c).

Compiles ``librle.so`` with the system C compiler on first use (cached next
to the source); falls back to pure python when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rle.c")
_LIB_PATH = os.path.join(_DIR, "librle.so")
_lib = None
_load_attempted = False


def _build() -> bool:
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True, timeout=120)
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.rle_decode_counts.restype = ctypes.c_longlong
    lib.rle_decode_counts.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong]
    lib.rle_fill.restype = ctypes.c_int
    lib.rle_fill.argtypes = [
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong]
    lib.rle_encode_mask.restype = ctypes.c_longlong
    lib.rle_encode_mask.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def rle_decode_counts_native(s: str) -> Optional[List[int]]:
    """Decode a compressed counts string; None if native lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    raw = s.encode("ascii")
    cap = len(raw) + 2
    out = np.empty(cap, dtype=np.int64)
    m = lib.rle_decode_counts(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        cap)
    if m < 0:
        raise ValueError(f"malformed RLE counts string (code {m})")
    return out[:m].tolist()


def rle_fill_native(counts, h: int, w: int) -> Optional[np.ndarray]:
    """Expand runs into a (H, W) uint8 mask; None if lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(counts, dtype=np.int64)
    flat = np.zeros(h * w, dtype=np.uint8)
    rc = lib.rle_fill(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), len(c),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h * w)
    if rc != 0:
        raise ValueError("RLE runs overflow the mask buffer")
    return flat.reshape(w, h).T


def rle_encode_mask_native(mask: np.ndarray) -> Optional[List[int]]:
    """Encode a (H, W) binary mask into column-major runs; None if the
    native lib is unavailable (rle.c::rle_encode_mask)."""
    lib = _load()
    if lib is None:
        return None
    flat = np.asfortranarray(np.ascontiguousarray(mask) != 0).reshape(
        -1, order="F").astype(np.uint8)
    cap = flat.size + 2  # worst case: alternating pixels
    out = np.empty(cap, dtype=np.int64)
    m = lib.rle_encode_mask(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), flat.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), cap)
    if m < 0:
        raise ValueError("RLE encode capacity overflow")
    counts = out[:m].tolist()
    if flat.size and flat[0] == 1:
        # runs must start with a 0-run; the C encoder starts with val=0 so
        # it already emits a leading zero-length run in this case.
        pass
    return counts
