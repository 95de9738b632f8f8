"""ctypes bindings for the native helpers in ``csrc/``.

The reference's asset pipeline leans on the engine's native code (its
NoiseCubemap CPU loop is tagged "really slow", ``noise_cubemap.gd:100``);
ours keeps the heavy asset generation native too: blue-noise mask generation
is O(n²·kernel) and takes minutes in numpy at ≥512² but seconds in C++.

Builds lazily with ``make -C csrc`` on first use; callers fall back to the
pure-Python implementation when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "csrc"))
_LIB_PATH = os.path.join(_CSRC, "libbluenoise.so")
_lib = None


def _load(build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.generate_blue_noise.argtypes = [
        ctypes.c_int, ctypes.c_float, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float)]
    lib.generate_blue_noise.restype = ctypes.c_int
    _lib = lib
    return lib


def generate_blue_noise_native(size: int = 256, sigma: float = 1.9,
                               seed: int = 7) -> Optional[np.ndarray]:
    """Void-and-cluster blue-noise mask via the C++ helper.

    Returns ``None`` if the native library is unavailable (caller falls back
    to the Python implementation in ``tools/gen_blue_noise.py``).
    """
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(size * size, np.float32)
    rc = lib.generate_blue_noise(
        size, ctypes.c_float(sigma), ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out.reshape(size, size)
