"""ctypes binding for the native host runtime (native/srlhost.cpp).

Provides batched frame gather, bilinear resize and threaded JPEG decode with
a single C call per batch. The library is built on first use (g++ is part of
the deployment image; ``make -C native`` does the same); every entry point
has a numpy/cv2 fallback so the framework never hard-depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_SRC_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_SRC_DIR, "libsrlhost.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    src = os.path.join(_SRC_DIR, "srlhost.cpp")
    if not os.path.exists(src):
        return False
    # Link to a per-process temp path, then atomically rename: multiple
    # ranks on one host may rebuild concurrently (stale-mtime check), and a
    # linker truncating the .so another rank just dlopen'd would SIGBUS it.
    tmp = f"{_SO_PATH}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", tmp, src, "-ljpeg", "-lpthread"],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO_PATH)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first use; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        src = os.path.join(_SRC_DIR, "srlhost.cpp")
        try:
            stale = (not os.path.exists(_SO_PATH)
                     or (os.path.exists(src)
                         and os.path.getmtime(src)
                         > os.path.getmtime(_SO_PATH)))
        except OSError:
            # TOCTOU with a concurrent `make clean`: treat as missing
            stale = True
        if stale and not _build():
            _lib_failed = os.path.exists(_SO_PATH) is False
            if _lib_failed:
                return None  # no library at all; stale-but-present still loads
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.batch_gather_u8.argtypes = [u8p, ctypes.c_int64, i32p,
                                        ctypes.c_int64, ctypes.c_int64, u8p]
        lib.batch_gather_u8.restype = ctypes.c_int
        lib.batch_resize_bilinear_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int]
        lib.batch_resize_bilinear_u8.restype = ctypes.c_int
        lib.batch_decode_jpeg.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.c_int]
        lib.batch_decode_jpeg.restype = ctypes.c_int
        _lib = lib
        return _lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def available() -> bool:
    return get_lib() is not None


def gather_frames(frames: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """dst[k] = frames[idx[k]] for a (N, H, W, C) uint8 store (mmap ok)."""
    lib = get_lib()
    idx = np.ascontiguousarray(idx, np.int32)
    if (lib is None or frames.dtype != np.uint8 or frames.ndim < 2
            or not frames.flags["C_CONTIGUOUS"]):
        return np.asarray(frames[idx])
    out = np.empty((len(idx),) + frames.shape[1:], np.uint8)
    frame_bytes = int(np.prod(frames.shape[1:]))
    rc = lib.batch_gather_u8(
        _u8ptr(frames), frames.shape[0],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(idx), frame_bytes, _u8ptr(out))
    if rc != 0:
        raise IndexError("gather_frames: index out of range")
    return out


def resize_batch(imgs: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Bilinear-resize (N, H, W, C) uint8 -> (N, dh, dw, C)."""
    lib = get_lib()
    n, sh, sw, c = imgs.shape
    if lib is None or imgs.dtype != np.uint8:
        import cv2
        return np.stack([cv2.resize(im, (dw, dh),
                                    interpolation=cv2.INTER_LINEAR)
                         for im in imgs])
    imgs = np.ascontiguousarray(imgs)
    out = np.empty((n, dh, dw, c), np.uint8)
    rc = lib.batch_resize_bilinear_u8(_u8ptr(imgs), n, sh, sw, c,
                                      _u8ptr(out), dh, dw)
    if rc != 0:
        # never hand back the uninitialized np.empty buffer as pixels
        raise ValueError(f"resize_batch: bad geometry "
                         f"({n}x{sh}x{sw}x{c} -> {dh}x{dw})")
    return out


def decode_jpeg_batch(paths: Sequence[str], dh: int, dw: int,
                      n_threads: int = 0) -> np.ndarray:
    """Decode+resize a batch of JPEG files to (N, dh, dw, 3) RGB uint8.
    Raises FileNotFoundError naming the first failing file."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    out = np.empty((n, dh, dw, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(8, (os.cpu_count() or 1) * 2)
    rc = lib.batch_decode_jpeg(arr, n, dh, dw, _u8ptr(out), n_threads)
    if rc != 0:
        raise FileNotFoundError(
            f"JPEG decode failed for {paths[rc - 1]!r}")
    return out
