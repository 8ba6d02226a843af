"""ctypes bridge to the native threaded JPEG frame loader
(native/frameloader.cpp). Compiles the shared library on first use (g++
-O3 -shared, cached next to the source with an mtime check) and falls
back to imageio when the toolchain or libjpeg is unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from idealnerf_tpu.utils.logging import get_logger

logger = get_logger("idealnerf.native")

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "frameloader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "native", "libframeloader.so")
_lib = None
_lib_failed = False


def _build() -> bool:
    src, so = os.path.abspath(_SRC), os.path.abspath(_SO)
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return True
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", so, src, "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        logger.info("built %s", so)
        return True
    except Exception as exc:
        logger.warning("native frameloader build failed (%s); imageio fallback",
                       exc)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not _build():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(os.path.abspath(_SO))
        lib.fl_decode_batch.restype = ctypes.c_int
        lib.fl_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.fl_stream_open.restype = ctypes.c_void_p
        lib.fl_stream_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.fl_stream_next.restype = ctypes.c_int
        lib.fl_stream_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.fl_stream_close.restype = None
        lib.fl_stream_close.argtypes = [ctypes.c_void_p]
        assert lib.fl_version() >= 2
        _lib = lib
    except Exception as exc:
        logger.warning("native frameloader load failed (%s)", exc)
        _lib_failed = True
    return _lib


def decode_jpeg_batch(
    paths: List[str], h: int, w: int, n_threads: Optional[int] = None,
) -> np.ndarray:
    """(N, h, w, 3) uint8 — parallel native decode, imageio fallback.

    Mismatched-size or corrupt frames come back zero-filled (native) /
    raise (fallback) — the native path logs how many decoded."""
    lib = get_lib()
    n = len(paths)
    if lib is not None:
        if n_threads is None:
            n_threads = min(os.cpu_count() or 1, 16)
        out = np.zeros((n, h, w, 3), np.uint8)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        ok = lib.fl_decode_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            h, w, n_threads,
        )
        if ok != n:
            logger.warning("native decode: %d/%d frames ok (rest zeroed)", ok, n)
        return out

    import imageio.v2 as imageio

    return np.stack([np.asarray(imageio.imread(p)) for p in paths])


def stream_decode_chunks(
    paths: List[str], h: int, w: int, chunk: int = 256,
    n_threads: Optional[int] = None,
):
    """Generator of ``(chunk_index, frames (n, h, w, 3) uint8)`` with
    double-buffered native read-ahead: while the consumer stages chunk k
    (e.g. ``jax.device_put``), the background pool is already decoding
    chunk k+1 into the other buffer half — the ingest path for subjects
    larger than HBM/host RAM. The yielded array is a VIEW of the ring
    buffer, valid only until the next iteration (copy to retain).

    Falls back to chunked ``decode_jpeg_batch`` (no read-ahead) when the
    native library is unavailable."""
    lib = get_lib()
    n = len(paths)
    if lib is None:
        for c in range(0, n, chunk):
            yield c // chunk, decode_jpeg_batch(paths[c : c + chunk], h, w)
        return

    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    handle = lib.fl_stream_open(arr, n, h, w, chunk, n_threads)
    if not handle:
        raise RuntimeError("fl_stream_open failed")
    try:
        while True:
            buf = ctypes.POINTER(ctypes.c_ubyte)()
            cnt = ctypes.c_int()
            idx = lib.fl_stream_next(handle, ctypes.byref(buf),
                                     ctypes.byref(cnt))
            if idx < 0:
                return
            frames = np.ctypeslib.as_array(
                buf, shape=(cnt.value, h, w, 3))
            yield idx, frames
    finally:
        lib.fl_stream_close(handle)
