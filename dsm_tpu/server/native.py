"""ctypes bindings for the native frame packer (native/packer.cpp).

Builds on demand (g++ is in the image); falls back to None when no compiler
is available so the engine can use its pure-python mailboxes.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger("dsm.native")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdsm_packer.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
        return True
    except Exception as e:
        log.warning("native packer build failed: %s", e)
        return False


def load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.packer_create.restype = ctypes.c_void_p
    lib.packer_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.packer_destroy.argtypes = [ctypes.c_void_p]
    lib.packer_reset_slot.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.packer_push.restype = ctypes.c_int64
    lib.packer_push.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.packer_available.restype = ctypes.c_int64
    lib.packer_available.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.packer_pack.restype = ctypes.c_int
    lib.packer_pack.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


class FramePacker:
    """Per-slot SPSC pcm rings + single-pass batch packing, GIL-free."""

    def __init__(self, batch: int, frame: int, capacity_frames: int = 64):
        lib = load_lib()
        if lib is None:
            raise RuntimeError("native packer unavailable")
        self._lib = lib
        self._h = lib.packer_create(batch, frame, capacity_frames)
        self.batch = batch
        self.frame = frame
        self._out = np.zeros((batch, frame), np.float32)
        self._mask = np.zeros(batch, np.uint8)
        self._active = np.zeros(batch, np.uint8)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.packer_destroy(self._h)
            self._h = None

    def reset_slot(self, slot: int) -> None:
        self._lib.packer_reset_slot(self._h, slot)

    def push(self, slot: int, pcm: np.ndarray) -> int:
        pcm = np.ascontiguousarray(pcm, np.float32)
        return self._lib.packer_push(
            self._h, slot,
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pcm),
        )

    def available(self, slot: int) -> int:
        return self._lib.packer_available(self._h, slot)

    def pack(self, active: np.ndarray):
        """active (B,) bool -> (out (B, frame) f32, mask (B,) bool, n)."""
        self._active[:] = active
        n = self._lib.packer_pack(
            self._h,
            self._active.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return self._out, self._mask.astype(bool), n
