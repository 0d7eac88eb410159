"""Native (C++) host-runtime hot paths with pure-Python fallbacks.

Builds ``libtiffcodec.so`` on first use (g++ -O3, links zlib) and exposes it
via ctypes. Every entry point has a numpy fallback so the framework works
without a toolchain; the data pipeline and mosaic stitcher pick the native
path automatically when available (see ``srbh_tpu.data.tiff`` and
``srbh_tpu.predict.stitcher``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tiffcodec.cpp")
_LIB = os.path.join(_HERE, "libtiffcodec.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    # compile to a per-pid temp name and os.replace into place: concurrent
    # fresh processes (loader workers, the dryrun re-exec) must never dlopen
    # a half-written .so
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return _LIB
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first call; None if the
    toolchain is unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            # corrupt/incompatible .so: behave like a missing toolchain so
            # callers take the documented pure-Python fallback
            _build_failed = True
            return None
        u8 = ctypes.POINTER(ctypes.c_uint8)
        lib.packbits_decode.restype = ctypes.c_long
        lib.packbits_decode.argtypes = [u8, ctypes.c_long, u8, ctypes.c_long]
        lib.packbits_encode.restype = ctypes.c_long
        lib.packbits_encode.argtypes = [u8, ctypes.c_long, u8]
        lib.lzw_decode.restype = ctypes.c_long
        lib.lzw_decode.argtypes = [u8, ctypes.c_long, u8, ctypes.c_long]
        lib.zlib_inflate.restype = ctypes.c_long
        lib.zlib_inflate.argtypes = [u8, ctypes.c_long, u8, ctypes.c_long]
        lib.zlib_deflate.restype = ctypes.c_long
        lib.zlib_deflate.argtypes = [u8, ctypes.c_long, u8, ctypes.c_long]
        lib.undo_predictor2.restype = None
        lib.undo_predictor2.argtypes = [u8, ctypes.c_long, ctypes.c_long,
                                        ctypes.c_long, ctypes.c_int]
        lib.blend_tiles.restype = None
        lib.blend_tiles.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ]
        _lib = lib
        return _lib


def _u8ptr(buf):
    return buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def packbits_decode(data: bytes, expected: int) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    dst = np.empty(expected, np.uint8)
    n = lib.packbits_decode(_u8ptr(src), len(src), _u8ptr(dst), expected)
    if n < 0:
        return None
    if n < expected:  # truncated chunk: zero-fill like the Python path
        dst[n:] = 0   # (np.empty tail would be uninitialised heap memory)
    return dst[:expected].tobytes()


def lzw_decode(data: bytes, expected: int) -> Optional[bytes]:
    """TIFF LZW decode (early change); None -> caller uses the Python path."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    dst = np.empty(max(expected, 1), np.uint8)
    n = lib.lzw_decode(_u8ptr(src), len(src), _u8ptr(dst), expected)
    if n < 0:
        return None
    if n < expected:  # truncated chunk: zero-fill like the Python path
        dst[n:] = 0
    return dst[:expected].tobytes()


def packbits_encode(data: bytes) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    dst = np.empty(len(src) + len(src) // 127 + 2, np.uint8)
    n = lib.packbits_encode(_u8ptr(src), len(src), _u8ptr(dst))
    return dst[:n].tobytes()


def blend_tiles(height_canvas: np.ndarray, build_canvas: np.ndarray,
                weight: np.ndarray, height_tiles: np.ndarray,
                build_tiles: np.ndarray, pos: np.ndarray,
                upscale: int) -> bool:
    """Native mosaic accumulation; returns False if unavailable (caller
    falls back to numpy). Arrays must be C-contiguous with the dtypes of
    ``srbh_tpu.predict.stitcher.MosaicAccumulator``."""
    lib = get_lib()
    if lib is None:
        return False
    n, t = height_tiles.shape[0], height_tiles.shape[1] // upscale
    c, H, W = build_canvas.shape
    lib.blend_tiles(
        height_canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        build_canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        weight.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        H, W, c,
        height_tiles.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        build_tiles.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, t, upscale)
    return True
