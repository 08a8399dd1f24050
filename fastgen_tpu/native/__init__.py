"""Native data-loader core (C++/zlib via ctypes).

TPU-native counterpart of the reference's torch C++ DataLoader workers
(``fastgen/datasets/class_cond_dataloader.py:10-49``): zip central-directory
parsing, raw-deflate, and an in-house 8-bit PNG decoder run in
``zipreader.cpp`` with the GIL released, so the producer thread's decode work
no longer serializes against the training step's host work on small hosts.

The shared library is compiled on demand with ``g++ -O3`` and cached next to
the source; any build/load failure degrades to ``available() == False`` and
callers fall back to the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "zipreader.cpp")
_SRCS = [_SRC, os.path.join(_DIR, "imgcodec.cpp")]
_LIB_PATH = os.path.join(_DIR, "libfgnative.so")
_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> bool:
    # full build (zip/PNG + libjpeg codec), then a degraded zlib-only build
    # if libjpeg/-dev is absent on this machine
    for srcs, libs in ((_SRCS, ["-lz", "-ljpeg"]), ([_SRC], ["-lz"])):
        cmd = (["g++", "-O3", "-shared", "-fPIC", "-std=c++17"] + srcs + libs
               + ["-o", _LIB_PATH])
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=240)
            return True
        except Exception:  # noqa: BLE001 - try the next variant
            continue
    return False


def _load():
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        stale = not os.path.exists(_LIB_PATH) or any(
            os.path.exists(s)
            and os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
            for s in _SRCS)
        if stale:
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None
        lib.fg_zip_open.restype = ctypes.c_void_p
        lib.fg_zip_open.argtypes = [ctypes.c_char_p]
        lib.fg_zip_close.argtypes = [ctypes.c_void_p]
        lib.fg_zip_count.restype = ctypes.c_int64
        lib.fg_zip_count.argtypes = [ctypes.c_void_p]
        lib.fg_zip_name.restype = ctypes.c_int64
        lib.fg_zip_name.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_char_p, ctypes.c_int64]
        lib.fg_zip_raw_size.restype = ctypes.c_int64
        lib.fg_zip_raw_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fg_zip_read.restype = ctypes.c_int64
        lib.fg_zip_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.c_int64]
        lib.fg_zip_decode_png_rgb.restype = ctypes.c_int
        lib.fg_zip_decode_png_rgb.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64]
        lib.fg_zip_decode_batch.restype = ctypes.c_int64
        lib.fg_zip_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.fg_png_probe.restype = ctypes.c_int
        lib.fg_png_probe.argtypes = [u8p, ctypes.c_int64, i32p, i32p]
        lib.fg_png_decode_rgb.restype = ctypes.c_int
        lib.fg_png_decode_rgb.argtypes = [u8p, ctypes.c_int64, u8p,
                                          ctypes.c_int64]
        # jpeg entry points exist only in the full (libjpeg) build
        try:
            lib.fg_jpeg_probe.restype = ctypes.c_int
            lib.fg_jpeg_probe.argtypes = [u8p, ctypes.c_int64, i32p, i32p]
            lib.fg_jpeg_decode_rgb.restype = ctypes.c_int
            lib.fg_jpeg_decode_rgb.argtypes = [u8p, ctypes.c_int64, u8p,
                                               ctypes.c_int64]
        except AttributeError:
            pass
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_image_rgb(data: bytes) -> Optional[np.ndarray]:
    """Decode in-memory PNG/JPEG bytes to [H, W, 3] uint8 via the native
    codecs (GIL released), or None → caller falls back to PIL. Dispatch is
    on magic bytes; dims come from a header probe first."""
    lib = _load()
    if lib is None or len(data) < 8:
        return None
    is_png = data[:8] == b"\x89PNG\r\n\x1a\n"
    is_jpg = data[:2] == b"\xff\xd8"
    if not (is_png or is_jpg):
        return None
    if is_jpg and not hasattr(lib, "fg_jpeg_probe"):
        return None  # zlib-only degraded build
    buf = np.frombuffer(data, np.uint8)
    src = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    probe = lib.fg_png_probe if is_png else lib.fg_jpeg_probe
    if probe(src, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    if w.value <= 0 or h.value <= 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    decode = lib.fg_png_decode_rgb if is_png else lib.fg_jpeg_decode_rgb
    rc = decode(src, len(data),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size)
    return out if rc == 0 else None


class NativeZipReader:
    """ctypes handle over one zip archive; thread-safe for reads is NOT
    guaranteed (libc FILE*), so keep one reader per producer thread."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native zip reader unavailable")
        self._lib = lib
        self._h = lib.fg_zip_open(path.encode())
        if not self._h:
            raise IOError(f"fg_zip_open failed for {path}")

    def __len__(self):
        return int(self._lib.fg_zip_count(self._h))

    def names(self):
        buf = ctypes.create_string_buffer(4096)
        out = []
        for i in range(len(self)):
            self._lib.fg_zip_name(self._h, i, buf, 4096)
            out.append(buf.value.decode())
        return out

    def read(self, index: int) -> bytes:
        size = int(self._lib.fg_zip_raw_size(self._h, index))
        out = np.empty(size, np.uint8)
        n = self._lib.fg_zip_read(
            self._h, index, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            size)
        if n < 0:
            raise IOError(f"fg_zip_read({index}) -> {n}")
        return out[:n].tobytes()

    def decode_png_rgb(self, index: int, height: int, width: int
                       ) -> Optional[np.ndarray]:
        """[H, W, 3] uint8, or None when the entry needs the PIL fallback."""
        out = np.empty((height, width, 3), np.uint8)
        rc = self._lib.fg_zip_decode_png_rgb(
            self._h, index, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            height, width)
        return out if rc == 0 else None

    def decode_batch(self, indices, height: int, width: int):
        """(images [N,H,W,3] uint8, n_ok) — entries past n_ok need PIL."""
        idx = np.asarray(indices, np.int64)
        out = np.empty((len(idx), height, width, 3), np.uint8)
        n_ok = self._lib.fg_zip_decode_batch(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            height, width)
        return out, int(n_ok)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.fg_zip_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass
