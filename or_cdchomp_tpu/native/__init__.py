"""ctypes bindings for the native host runtime (libcdx_native.so).

Builds on demand with the in-tree Makefile if the shared object is
missing; every entry point has a pure-Python/JAX fallback, so the
package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcdx_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.cdx_shparse.restype = ctypes.c_int
    lib.cdx_shparse.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int64)]
    lib.cdx_sedt_3d.restype = ctypes.c_int
    lib.cdx_sedt_3d.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]
    lib.cdx_signed_edt.restype = ctypes.c_int
    lib.cdx_signed_edt.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double)]
    lib.cdx_grid_read.restype = ctypes.c_int
    lib.cdx_grid_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                  ctypes.c_int64]
    lib.cdx_grid_write.restype = ctypes.c_int
    lib.cdx_grid_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                   ctypes.c_int64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def shparse_native(text: str):
    """Native tokenizer; raises ValueError on syntax errors (parity
    with utils.shparse.shparse)."""
    lib = _load()
    if lib is None:
        from or_cdchomp_tpu.utils.shparse import shparse
        return shparse(text)
    raw = text.encode()
    cap = len(raw) * 2 + 16
    buf = ctypes.create_string_buffer(cap)
    ntok = ctypes.c_int64(0)
    rc = lib.cdx_shparse(raw, buf, cap, ctypes.byref(ntok))
    if rc == -1:
        raise ValueError("shparse syntax error (unterminated quote/escape)")
    if rc != 0:
        raise RuntimeError(f"cdx_shparse failed: {rc}")
    out = []
    pos = 0
    for _ in range(ntok.value):
        end = buf.raw.index(b"\0", pos)
        out.append(buf.raw[pos:end].decode())
        pos = end + 1
    return out


def signed_edt_native(occupied, lengths):
    """Exact signed EDT on the host (O(n) per line); float64 output.

    Falls back to the JAX implementation when the native library is
    unavailable.
    """
    lib = _load()
    occupied = np.ascontiguousarray(occupied, dtype=np.uint8)
    if lib is None:
        from or_cdchomp_tpu.ops.edt import signed_edt
        return np.asarray(signed_edt(occupied.astype(bool), lengths),
                          dtype=np.float64)
    nx, ny, nz = occupied.shape
    lengths = np.asarray(lengths, dtype=np.float64)
    res2 = np.ascontiguousarray(
        (lengths / np.array([nx, ny, nz], dtype=np.float64)) ** 2)
    out = np.empty((nx, ny, nz), dtype=np.float64)
    rc = lib.cdx_signed_edt(
        occupied.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nx, ny, nz,
        res2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError(f"cdx_signed_edt failed: {rc}")
    return out


def grid_cache_read(path: str, shape, dtype=np.float64):
    """Raw binary cache read with size validation (reference format,
    orcdchomp_mod.cpp:416-444).  Returns None on mismatch/missing."""
    data = np.empty(shape, dtype=dtype)
    lib = _load()
    if lib is None:
        try:
            raw = np.fromfile(path, dtype=dtype)
        except (FileNotFoundError, OSError):
            return None
        if raw.size != data.size:
            return None
        return raw.reshape(shape)
    rc = lib.cdx_grid_read(path.encode(), data.ctypes.data, data.nbytes)
    return data if rc == 0 else None


def grid_cache_write(path: str, array) -> bool:
    array = np.ascontiguousarray(array)
    lib = _load()
    if lib is None:
        array.tofile(path)
        return True
    rc = lib.cdx_grid_write(path.encode(), array.ctypes.data, array.nbytes)
    return rc == 0
