"""LZ4-frame decompression via the first-party native decoder.

Loads ``native/liblz4dec.so`` (building it with ``make`` on first use if the
toolchain is available) and exposes :func:`decompress` /
:func:`open_npy_lz4`, replacing the reference's dependency on the ``lz4``
wheel for `.npy.lz4` MRI volumes (`dataset/ipmsa.py:45-52`).
"""

from __future__ import annotations

import ctypes
import io
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["decompress", "open_npy_lz4", "load_npy_lz4", "native_available"]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblz4dec.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.lz4_frame_decompress.restype = ctypes.c_int
    lib.lz4_frame_decompress.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_void_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.lz4_frame_content_size.restype = ctypes.c_ulonglong
    lib.lz4_frame_content_size.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def decompress(data: bytes) -> bytes:
    """Decompress one LZ4 frame to bytes."""
    lib = _load()
    hint = int(lib.lz4_frame_content_size(data, len(data)))
    cap = hint if hint > 0 else max(4 * len(data), 1 << 20)
    while True:
        out = ctypes.create_string_buffer(cap)
        out_len = ctypes.c_size_t(0)
        rc = lib.lz4_frame_decompress(
            data, len(data), out, cap, ctypes.byref(out_len)
        )
        if rc == 0:
            return out.raw[: out_len.value]
        if rc == -2:  # output buffer too small → grow
            cap *= 2
            continue
        raise ValueError(f"lz4 frame decode failed (code {rc})")


def open_npy_lz4(path: str) -> io.BytesIO:
    with open(path, "rb") as f:
        return io.BytesIO(decompress(f.read()))


def load_npy_lz4(path: str) -> np.ndarray:
    """Load a `.npy.lz4` volume (reference `load_image`, `dataset/ipmsa.py:45-52`)."""
    return np.load(open_npy_lz4(path))
