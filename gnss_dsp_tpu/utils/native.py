"""ctypes bridge to the native I/O helpers (utils/native/iqloader.cpp).

Builds the shared library on first use with the system compiler (g++,
-O3 -march=native) into the package directory; every entry point has a
numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_DIR, "iqloader.cpp")
_LIB = os.path.join(_DIR, "libiqloader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _fresh() -> bool:
    """True if the built .so exists and is newer than its source.

    The .so is never committed (a binary built with -march=native on one
    machine can SIGILL on another); it is rebuilt here on first use, and
    rebuilt again whenever iqloader.cpp changes.
    """
    try:
        return os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
    except OSError:
        return False


def lib():
    """The loaded library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            if _fresh() or _build():
                try:
                    L = ctypes.CDLL(_LIB)
                    L.iq_deinterleave_f32.argtypes = [
                        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_size_t]
                    L.iq_deinterleave_c64.argtypes = [
                        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
                    _lib = L
                except OSError:
                    _lib = None
    return _lib


def deinterleave_f32(raw: bytes | np.ndarray):
    """int8 interleaved I/Q -> (re f32 [n], im f32 [n])."""
    buf = np.frombuffer(raw, np.int8) if isinstance(raw, bytes) else raw
    n = buf.shape[0] // 2
    L = lib()
    if L is None:
        s = buf[: 2 * n].reshape(-1, 2).astype(np.float32)
        return np.ascontiguousarray(s[:, 0]), np.ascontiguousarray(s[:, 1])
    re = np.empty(n, np.float32)
    im = np.empty(n, np.float32)
    L.iq_deinterleave_f32(
        buf.ctypes.data_as(ctypes.c_void_p),
        re.ctypes.data_as(ctypes.c_void_p),
        im.ctypes.data_as(ctypes.c_void_p),
        n,
    )
    return re, im


def deinterleave_c64(raw: bytes | np.ndarray) -> np.ndarray:
    """int8 interleaved I/Q -> complex64 [n]."""
    buf = np.frombuffer(raw, np.int8) if isinstance(raw, bytes) else raw
    n = buf.shape[0] // 2
    L = lib()
    if L is None:
        s = buf[: 2 * n].reshape(-1, 2)
        x = np.empty(n, np.complex64)
        x.real = s[:, 0]
        x.imag = s[:, 1]
        return x
    out = np.empty(n, np.complex64)
    L.iq_deinterleave_c64(
        buf.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        n,
    )
    return out
