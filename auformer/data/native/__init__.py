"""ctypes binding + on-demand build of the native framestore reader.

Compiles framestore_reader.cpp with g++ -O3 -ljpeg on first use (cached
as _framestore.so next to the source). Falls back gracefully: callers check
``available()`` and use the pure-Python FrameStore path otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "framestore_reader.cpp")
_SO = os.path.join(_HERE, "_framestore.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    if os.path.isfile(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return None
    # build to a unique temp name and rename: atomic vs concurrent builders
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           _SRC, "-o", tmp, "-ljpeg"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if r.returncode != 0:
        return r.stderr[-2000:]
    try:
        os.replace(tmp, _SO)
    except OSError as e:
        return str(e)
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err is not None:
            _build_error = err
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.fs_open.restype = ctypes.c_void_p
        lib.fs_open.argtypes = [ctypes.c_char_p]
        lib.fs_close.argtypes = [ctypes.c_void_p]
        lib.fs_num_entries.restype = ctypes.c_long
        lib.fs_num_entries.argtypes = [ctypes.c_void_p]
        lib.fs_get_raw.restype = ctypes.c_int
        lib.fs_get_raw.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_long)]
        lib.fs_decode_batch.restype = ctypes.c_int
        lib.fs_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


class NativeFrameStore:
    """Native mmap'd reader with batched off-GIL JPEG decode."""

    def __init__(self, path: str, n_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native reader unavailable: {_build_error}")
        self._lib = lib
        self._h = lib.fs_open(path.encode())
        if not self._h:
            raise OSError(f"fs_open failed for {path}")
        self.n_threads = n_threads

    def __len__(self) -> int:
        return self._lib.fs_num_entries(self._h)

    def get(self, key: str) -> bytes | None:
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        size = ctypes.c_long()
        if not self._lib.fs_get_raw(self._h, key.encode(),
                                    ctypes.byref(ptr), ctypes.byref(size)):
            return None
        return ctypes.string_at(ptr, size.value)

    def decode_batch(self, keys: list[str | None], height: int, width: int,
                     channels: int = 3) -> tuple[np.ndarray, np.ndarray]:
        """Decode JPEGs for keys -> (n, H, W, C) uint8 + (n,) ok flags.
        None/empty keys stay black with ok=0."""
        n = len(keys)
        out = np.zeros((n, height, width, channels), np.uint8)
        ok = np.zeros(n, np.uint8)
        arr = (ctypes.c_char_p * n)(
            *[(k.encode() if k else b"") for k in keys])
        self._lib.fs_decode_batch(
            self._h, arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            height, width, channels,
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.n_threads)
        return out, ok.astype(bool)

    def close(self) -> None:
        if self._h:
            self._lib.fs_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
