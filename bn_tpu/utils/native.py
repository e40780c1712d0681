"""ctypes bindings for the C++ host codec (csrc/bn_host.cpp).

Builds the shared library on first use (g++ -O3, cached under
<repo>/.build/); falls back to None if no toolchain is available, in which
case callers use the pure-Python paths in bn_tpu.serialization.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "csrc" / "bn_host.cpp"
_BUILD = _REPO / ".build"
_SO = _BUILD / "libbn_host.so"


def _build() -> bool:
    _BUILD.mkdir(exist_ok=True)
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-o",
                str(_SO),
                str(_SRC),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def lib():
    """The loaded library, or None when unavailable."""
    if not _build():
        return None
    try:
        L = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    L.bn_fp_decode_batch.restype = ctypes.c_long
    L.bn_fp_decode_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    L.bn_fp_encode_batch.restype = None
    L.bn_fp_encode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_char_p,
    ]
    L.bn_fq2_decode_batch.restype = ctypes.c_long
    L.bn_fq2_decode_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    L.bn_fq2_encode_batch.restype = None
    L.bn_fq2_encode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_long,
        ctypes.c_char_p,
    ]
    L.bn_fp_interpret_batch.restype = None
    L.bn_fp_interpret_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    assert L.bn_host_abi_version() == 1
    return L


def available() -> bool:
    return lib() is not None


def _u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


FIELD_FQ, FIELD_FR = 0, 1


def fp_decode_batch(data: bytes, field: int) -> np.ndarray:
    """(n*32) canonical BE bytes -> (n, 16) uint32 Montgomery limb rows.
    Raises ValueError at the first out-of-range element."""
    n = len(data) // 32
    out = np.empty((n, 16), dtype=np.uint32)
    bad = lib().bn_fp_decode_batch(data, n, field, _u32p(out))
    if bad >= 0:
        raise ValueError(f"element {bad}: integer is not less than modulus")
    return out


def fp_encode_batch(limbs: np.ndarray, field: int) -> bytes:
    """(n, 16) uint32 Montgomery limb rows -> n*32 canonical BE bytes."""
    limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
    n = limbs.shape[0]
    out = ctypes.create_string_buffer(n * 32)
    lib().bn_fp_encode_batch(_u32p(limbs), n, field, out)
    return out.raw


def fq2_decode_batch(data: bytes) -> np.ndarray:
    """(n*64) BE U512 bytes -> (n, 32) uint32 rows (c0 | c1 limbs)."""
    n = len(data) // 64
    out = np.empty((n, 32), dtype=np.uint32)
    bad = lib().bn_fq2_decode_batch(data, n, _u32p(out))
    if bad >= 0:
        raise ValueError(f"element {bad}: integer not less than modulus squared")
    return out


def fq2_encode_batch(limbs: np.ndarray) -> bytes:
    limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
    n = limbs.shape[0]
    out = ctypes.create_string_buffer(n * 64)
    lib().bn_fq2_encode_batch(_u32p(limbs), n, out)
    return out.raw


def fp_interpret_batch(data: bytes, field: int) -> np.ndarray:
    """(n*64) BE bytes -> (n, 16) uint32 Montgomery rows via mod-m reduction."""
    n = len(data) // 64
    out = np.empty((n, 16), dtype=np.uint32)
    lib().bn_fp_interpret_batch(data, n, field, _u32p(out))
    return out
