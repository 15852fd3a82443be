"""ctypes wrapper for the C++ tar member index (random access reads)."""
from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from ml_mdm_tpu import native


class NativeTar:
    def __init__(self, path: str):
        lib = native.load()
        if lib is None:
            raise RuntimeError("native datacore unavailable")
        self._lib = lib
        self._handle = lib.dc_tar_open(path.encode())
        if not self._handle:
            raise FileNotFoundError(path)

    def read(self, member: str) -> Optional[bytes]:
        name = member.encode()
        size = self._lib.dc_tar_member_size(self._handle, name)
        if size < 0:
            return None
        buf = np.empty(size, dtype=np.uint8)
        n = self._lib.dc_tar_read(
            self._handle, name,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size,
        )
        return buf.tobytes() if n == size else None

    def __del__(self):
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_handle", None)
        if lib is not None and h:
            try:
                lib.dc_tar_free(h)
            except Exception:
                pass
