"""Native (C++) data-plane bindings.

Replaces the mlx.data C++ core the reference depends on (reference
reader.py:8-11): trie tokenization, JPEG decode/resize/crop, tar member
reads. The shared library is compiled on first use with g++ and cached
next to this file; every entry point degrades to the pure-Python path
when the toolchain or libjpeg is unavailable.

ctypes foreign calls release the GIL, so the reader's Python worker
threads get real multi-core scaling through these functions.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "datacore.cpp")
_SO = os.path.join(_HERE, "libdatacore.so")

_lib = None
_lock = threading.Lock()
_logger = logging.getLogger(__name__)


def _build() -> bool:
    # compile to a process-unique temp path and rename into place:
    # os.rename is atomic, so concurrent processes never dlopen a
    # half-written .so (each may build its own copy; last rename wins)
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
        "-o", tmp, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except Exception as exc:  # toolchain/libjpeg missing: fall back
        _logger.debug("native build failed: %s", exc)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load():
    """Return the loaded library, building it if needed; None if
    unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib or None
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _lib = False
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib = False
            return None

        lib.dc_tok_new.restype = ctypes.c_void_p
        lib.dc_tok_new.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.dc_tok_free.argtypes = [ctypes.c_void_p]
        lib.dc_tok_tokenize.restype = ctypes.c_int32
        lib.dc_tok_tokenize.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]

        lib.dc_image_decode_resize_crop.restype = ctypes.c_int32
        lib.dc_image_decode_resize_crop.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8),
        ]

        lib.dc_tar_open.restype = ctypes.c_void_p
        lib.dc_tar_open.argtypes = [ctypes.c_char_p]
        lib.dc_tar_member_size.restype = ctypes.c_int64
        lib.dc_tar_member_size.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.dc_tar_read.restype = ctypes.c_int64
        lib.dc_tar_read.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.dc_tar_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def available() -> bool:
    return load() is not None
