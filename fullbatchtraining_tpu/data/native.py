"""ctypes bindings for the native data engines (native/*.cpp).

Two independent libraries, each built on first use (g++ -O3) and each with a
pure-Python/JAX fallback so everything degrades gracefully when no compiler
(or libjpeg) is available:

* ``libfbt_data``  — the N×rounds augmentation baker + row gather
  (native/fbt_data.cpp).
* ``libfbt_jpeg``  — batched JPEG decode + PIL-equivalent shorter-side
  resize + center crop for the ImageFolder/ImageNet cache
  (native/fbt_jpeg.cpp, links libjpeg); the reference's equivalent is
  torchvision's PIL ImageFolder under multi-worker DataLoaders
  (/root/reference/fullbatch/data/data_preparation.py:129-147).
"""

from __future__ import annotations

import ctypes
import functools
import hashlib
import logging
import platform
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

# C++ sources: repo checkouts keep them at <repo>/native/ (canonical, as
# documented); installed wheels ship them as package data under
# _native_src/ (pyproject [tool.setuptools.package-data]) so pip users get
# the native engines too. First existing location wins.
_NATIVE_DIRS = (Path(__file__).resolve().parent.parent.parent / "native",
                Path(__file__).resolve().parent.parent / "_native_src")
_LIB_DIR = Path(__file__).resolve().parent.parent / "_native"


def _find_src(src_name: str) -> Path:
    for d in _NATIVE_DIRS:
        if (d / src_name).exists():
            return d / src_name
    return _NATIVE_DIRS[0] / src_name  # nonexistent: loader degrades to JAX


@functools.lru_cache
def _cpu_tag() -> str:
    """Host-CPU fingerprint baked into the cached .so filename.

    ``-march=native`` output is CPU-specific: on a shared filesystem with
    heterogeneous hosts (multi-host NFS installs — bake_dataset supports
    jax.process_count()>1), a build from an AVX-512 host would SIGILL on an
    older CPU that passes the mtime freshness check. Keying the filename by
    the CPU model + ISA flags makes each distinct CPU build its own."""
    text = platform.machine()
    try:
        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith(("model name", "flags")):
                text += line
                if line.startswith("flags"):
                    break
    except OSError:
        pass
    return hashlib.md5(text.encode()).hexdigest()[:10]


class _NativeLib:
    """Build-on-first-use loader for one shared library."""

    def __init__(self, src_name: str, lib_name: str, abi_symbol: str,
                 extra_flags: tuple[str, ...] = ()):
        self.src = _find_src(src_name)
        stem, suffix = lib_name.rsplit(".", 1)
        self.lib_path = _LIB_DIR / f"{stem}.{_cpu_tag()}.{suffix}"
        self.abi_symbol = abi_symbol
        self.extra_flags = extra_flags
        self._lib = None
        self._tried = False

    def _build(self) -> bool:
        """Compile to a pid-unique temp path, then atomically rename under an
        flock: concurrent first-use processes must never dlopen a half-written
        .so (g++ truncates its output in place) or compile over a mapped one."""
        import fcntl
        import os

        _LIB_DIR.mkdir(parents=True, exist_ok=True)
        tmp = self.lib_path.with_name(f".{self.lib_path.name}.{os.getpid()}.tmp")
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", str(tmp), str(self.src), *self.extra_flags]
        try:
            with open(_LIB_DIR / f".{self.lib_path.stem}.build.lock", "w") as lock:
                fcntl.flock(lock, fcntl.LOCK_EX)
                try:
                    if (self.lib_path.exists()
                            and self.lib_path.stat().st_mtime
                            >= self.src.stat().st_mtime):
                        return True  # another process built it while we waited
                    subprocess.run(cmd, check=True, capture_output=True,
                                   text=True, timeout=120)
                    os.replace(tmp, self.lib_path)
                    return True
                finally:
                    fcntl.flock(lock, fcntl.LOCK_UN)
        except (subprocess.SubprocessError, FileNotFoundError, OSError) as err:
            tmp.unlink(missing_ok=True)
            log.warning("Native engine build failed for %s (%s); "
                        "using the fallback path.", self.src.name, err)
            return False

    def get(self, configure) -> ctypes.CDLL | None:
        """Load (building if needed); ``configure(lib)`` sets arg/restypes."""
        if self._lib is not None or self._tried:
            return self._lib
        self._tried = True
        stale = (self.src.exists() and self.lib_path.exists()
                 and self.lib_path.stat().st_mtime < self.src.stat().st_mtime)
        if not self.lib_path.exists() or stale:
            if not self.src.exists() or not self._build():
                return None
        try:
            lib = ctypes.CDLL(str(self.lib_path))
        except OSError as err:
            log.warning("Native engine load failed for %s (%s).",
                        self.lib_path.name, err)
            return None
        try:
            abi = getattr(lib, self.abi_symbol)()
        except AttributeError:  # stale/foreign .so without the ABI symbol
            abi = None
        if abi != 1:
            log.warning("Native engine ABI mismatch for %s; "
                        "using the fallback path.", self.lib_path.name)
            return None
        configure(lib)
        self._lib = lib
        return self._lib


_u8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)

_data_lib = _NativeLib("fbt_data.cpp", "libfbt_data.so", "fbt_abi_version")
_jpeg_lib = _NativeLib("fbt_jpeg.cpp", "libfbt_jpeg.so",
                       "fbt_jpeg_abi_version", ("-ljpeg", "-pthread"))


def _configure_data(lib):
    lib.bake_rounds.argtypes = [_u8p] + [ctypes.c_int64] * 6 + \
        [ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_uint64, _u8p, _i32p]
    lib.bake_rounds.restype = None
    lib.gather_rows.argtypes = [_u8p, _i64p, ctypes.c_int64, ctypes.c_int64, _u8p]
    lib.gather_rows.restype = None


def _configure_jpeg(lib):
    lib.decode_resize_batch.argtypes = [
        _u8p, _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _u8p, _u8p]
    lib.decode_resize_batch.restype = ctypes.c_int64


def get_lib():
    """The baker/gather library, or None (JAX fallback)."""
    return _data_lib.get(_configure_data)


def get_jpeg_lib():
    """The JPEG decode library, or None (PIL fallback)."""
    return _jpeg_lib.get(_configure_jpeg)


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
        images.ctypes.data_as(_u8p),
        n, h, w, c, rounds, pad, float(flip_p),
        int(first_round_clean), int(shuffle), np.uint64(seed),
        out.ctypes.data_as(_u8p),
        order.ctypes.data_as(_i32p))
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
    lib.gather_rows(flat.ctypes.data_as(_u8p),
                    idx.ctypes.data_as(_i64p),
                    len(idx), flat.shape[1],
                    out.ctypes.data_as(_u8p))
    return out.reshape((len(idx),) + images.shape[1:])


def decode_resize_jpeg_batch(blobs: list[bytes], side: int,
                             out: np.ndarray | None = None,
                             n_threads: int = 0
                             ) -> tuple[np.ndarray, np.ndarray] | None:
    """Decode ``blobs`` (JPEG file bytes) to (n, side, side, 3) uint8 rows:
    shorter-side triangle-filter resize to ``side`` + center crop, matching
    the PIL loop in datasets._load_imagefolder. Returns (images, ok) where
    ok[i]=False marks files the caller must decode with PIL (CMYK, corrupt,
    non-JPEG), or None if the native engine is unavailable."""
    lib = get_jpeg_lib()
    if lib is None:
        return None
    n = len(blobs)
    if out is None:
        out = np.empty((n, side, side, 3), np.uint8)
    else:
        _check_u8c(out, "out")
        if out.shape != (n, side, side, 3):
            raise ValueError(f"out shape {out.shape} != {(n, side, side, 3)}")
    ok = np.zeros(n, np.uint8)
    if n == 0:
        return out, ok.astype(bool)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    blob = b"".join(blobs)
    blob_arr = np.frombuffer(blob, np.uint8) if blob else np.zeros(1, np.uint8)
    lib.decode_resize_batch(
        blob_arr.ctypes.data_as(_u8p),
        offsets.ctypes.data_as(_i64p),
        n, side, int(n_threads),
        out.ctypes.data_as(_u8p),
        ok.ctypes.data_as(_u8p))
    return out, ok.astype(bool)
