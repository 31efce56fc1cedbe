"""ctypes bindings for the native C++ image loader (native/gpp_loader.cpp).

Builds the shared library on first use with g++ (cached next to the source)
and exposes decode + resize + pad as numpy-filling batch calls that run off
the GIL on a C++ thread pool. Falls back gracefully: `available()` reports
whether the toolchain/libraries are present, and data.pipeline uses PIL when
it is not.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

__all__ = ["available", "NativeImageLoader"]

_SRC = os.path.join(os.path.dirname(__file__), "..", "native",
                    "gpp_loader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "native",
                   "libgpp_loader.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    # compile to a temp path + atomic rename: a g++ killed mid-link must
    # not leave a corrupt .so that later loads fail on
    tmp = _SO + ".tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-lpng", "-ljpeg", "-pthread", "-o", tmp]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:  # no toolchain
        return str(e)
    if res.returncode != 0:
        return res.stderr
    os.replace(tmp, _SO)
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            stale = (not os.path.exists(_SO)
                     or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        except OSError:  # source missing next to a shipped .so
            stale = not os.path.exists(_SO)
        if stale:
            _build_error = _build()
            if _build_error:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # stray/incompatible library: rebuild once, else fall back
            _build_error = _build()
            if _build_error:
                return None
            try:
                lib = ctypes.CDLL(_SO)
            except OSError as e:
                _build_error = str(e)
                return None
        lib.gpp_load_image.restype = ctypes.c_int
        lib.gpp_load_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.gpp_load_batch.restype = ctypes.c_int
        lib.gpp_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int]
        lib.gpp_image_size.restype = ctypes.c_int
        lib.gpp_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeImageLoader:
    """Batch image loading through the C++ library."""

    def __init__(self, n_threads: int = 8):
        self.lib = _load()
        if self.lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self.n_threads = n_threads

    def image_size(self, path: str):
        h = ctypes.c_int()
        w = ctypes.c_int()
        if self.lib.gpp_image_size(path.encode(), ctypes.byref(h),
                                   ctypes.byref(w)) != 0:
            raise IOError(f"cannot probe {path}")
        return h.value, w.value

    def load_image(self, path: str, out_hw, scale: float) -> np.ndarray:
        """One image -> zero-padded float32 BGR canvas (out_h, out_w, 3)."""
        out = np.empty((*out_hw, 3), np.float32)
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self.lib.gpp_load_image(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_hw[0], out_hw[1], scale, ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            raise IOError(f"cannot decode {path}")
        return out

    def load_batch(self, paths: Sequence[str], out_hw,
                   scales: Sequence[float]) -> np.ndarray:
        """Threaded batch -> (N, out_h, out_w, 3) float32 BGR, zero-padded."""
        n = len(paths)
        out = np.zeros((n, *out_hw, 3), np.float32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        c_scales = np.asarray(scales, np.float64)
        failures = self.lib.gpp_load_batch(
            c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_hw[0], out_hw[1],
            c_scales.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.n_threads)
        if failures:
            raise IOError(f"{failures}/{n} images failed to decode")
        return out
