"""Lazy builder/loader for the TPU-MinLZ native (C++) runtime.

Compiles every ``.cpp`` in this directory into one shared library with g++ on
first use and caches it next to the sources.  Pure-Python fallbacks exist for
every native entry point, so environments without a toolchain still work.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libminlz_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _needs_build() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for name in os.listdir(_DIR):
        if name.endswith((".cpp", ".h")):
            if os.path.getmtime(os.path.join(_DIR, name)) > lib_mtime:
                return True
    return False


def _build() -> None:
    sources = sorted(
        os.path.join(_DIR, f) for f in os.listdir(_DIR) if f.endswith(".cpp")
    )
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-fvisibility=hidden", "-o", _LIB_PATH, *sources,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Return the loaded native library, or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if _needs_build():
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.minlz_crc32c.restype = ctypes.c_uint32
            lib.minlz_crc32c.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32,
            ]
            if hasattr(lib, "minlz_huff0_decode_stream"):
                lib.minlz_huff0_decode_stream.restype = ctypes.c_long
                lib.minlz_huff0_decode_stream.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t,
                    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                    ctypes.c_char_p, ctypes.c_size_t,
                ]
                lib.minlz_huff0_encode_stream.restype = ctypes.c_long
                lib.minlz_huff0_encode_stream.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t,
                    ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_char_p, ctypes.c_size_t,
                ]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib
