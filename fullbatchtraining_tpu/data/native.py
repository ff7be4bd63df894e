"""ctypes binding for the native data-baking engine (native/fbt_data.cpp).

Builds libfbt_data.so on first use (g++ -O3) and exposes bake_rounds /
gather_rows. Everything degrades gracefully: if no compiler is available the
callers fall back to the jitted-JAX baking path.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "fbt_data.cpp"
_LIB_DIR = Path(__file__).resolve().parent.parent / "_native"
_LIB = _LIB_DIR / "libfbt_data.so"

_lib = None
_tried = False


def _build() -> bool:
    """Compile to a pid-unique temp path, then atomically rename under an
    flock: concurrent first-use processes must never dlopen a half-written
    .so (g++ truncates its output in place) or compile over a mapped one."""
    import fcntl
    import os

    _LIB_DIR.mkdir(parents=True, exist_ok=True)
    tmp = _LIB.with_name(f".{_LIB.name}.{os.getpid()}.tmp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", str(tmp), str(_SRC)]
    try:
        with open(_LIB_DIR / ".build.lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                if (_LIB.exists()
                        and _LIB.stat().st_mtime >= _SRC.stat().st_mtime):
                    return True  # another process built it while we waited
                subprocess.run(cmd, check=True, capture_output=True,
                               text=True, timeout=120)
                os.replace(tmp, _LIB)
                return True
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as err:
        tmp.unlink(missing_ok=True)
        log.warning("Native data engine build failed (%s); using the JAX path.", err)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    stale = (_SRC.exists() and _LIB.exists()
             and _LIB.stat().st_mtime < _SRC.stat().st_mtime)
    if not _LIB.exists() or stale:
        if not _SRC.exists() or not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError as err:
        log.warning("Native data engine load failed (%s).", err)
        return None
    if lib.fbt_abi_version() != 1:
        log.warning("Native data engine ABI mismatch; using the JAX path.")
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.bake_rounds.argtypes = [u8p] + [ctypes.c_int64] * 6 + \
        [ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_uint64, u8p, i32p]
    lib.bake_rounds.restype = None
    lib.gather_rows.argtypes = [u8p, i64p, ctypes.c_int64, ctypes.c_int64, u8p]
    lib.gather_rows.restype = None
    _lib = lib
    return _lib


def bake_rounds_native(images: np.ndarray, rounds: int, pad: int, flip_p: float,
                       first_round_clean: bool, shuffle: bool, seed: int,
                       out: np.ndarray) -> np.ndarray | None:
    """Fill ``out`` (rounds, n, h, w, c) with augmented epochs; returns the
    (rounds, n) source-index array, or None if the native engine is absent."""
    lib = get_lib()
    if lib is None:
        return None
    _check_u8c(images, "images")
    _check_u8c(out, "out")
    n, h, w, c = images.shape
    if out.shape != (rounds, n, h, w, c):
        raise ValueError(f"out shape {out.shape} != {(rounds, n, h, w, c)}")
    order = np.empty((rounds, n), np.int32)
    lib.bake_rounds(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c, rounds, pad, float(flip_p),
        int(first_round_clean), int(shuffle), np.uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return order


def _check_u8c(arr, what):
    if arr.dtype != np.uint8 or not arr.flags.c_contiguous:
        raise ValueError(f"{what} must be C-contiguous uint8, got "
                         f"{arr.dtype}/{arr.flags.c_contiguous}")


def gather_rows_native(images: np.ndarray, indices: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    if images.dtype != np.uint8:
        return None  # JAX/numpy fallback handles non-byte imagery
    flat = np.ascontiguousarray(images).reshape(len(images), -1)
    idx = np.ascontiguousarray(indices, np.int64)
    if idx.size and (idx.min() < 0 or idx.max() >= len(images)):
        raise IndexError("gather_rows_native: index out of range")
    out = np.empty((len(idx), flat.shape[1]), np.uint8)
    lib.gather_rows(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    len(idx), flat.shape[1],
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.reshape((len(idx),) + images.shape[1:])
