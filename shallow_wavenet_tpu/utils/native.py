"""ctypes bindings to the native C++ library (native/libswt_native.so).

The reference leaned on external native DSP (SPTK C, WORLD C++); this
framework's equivalent native surface is built in-repo (SURVEY.md §2.3) and
auto-compiled on first use (g++ is baked into the image; no pybind11, so
plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libswt_native.so"
_lib = None


def _build() -> None:
    subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                   capture_output=True, text=True)


def load_native(build: bool = True) -> ctypes.CDLL:
    """Load (building if needed) the native library. Raises OSError if the
    toolchain is unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build:
        log.info("building native library in %s", _NATIVE_DIR)
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.swt_mlsa_filter.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.swt_mlsa_filter.restype = None
    lib.swt_mc2b.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.swt_mc2b.restype = None
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        load_native()
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        log.warning("native library unavailable: %s", e)
        return False


def mlsa_filter_native(x: np.ndarray, b: np.ndarray, alpha: float,
                       pade_order: int = 5, inverse: bool = False
                       ) -> np.ndarray:
    """Native MLSA filter; x (T,) float32, b (M+1,) mc2b coefficients."""
    lib = load_native()
    x = np.ascontiguousarray(x, np.float32)
    b = np.ascontiguousarray(b, np.float64)
    y = np.empty_like(x)
    lib.swt_mlsa_filter(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size,
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), b.size - 1,
        float(alpha), int(pade_order), int(inverse),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return y


def mc2b_native(c: np.ndarray, alpha: float) -> np.ndarray:
    lib = load_native()
    c = np.ascontiguousarray(c, np.float64)
    b = np.empty_like(c)
    lib.swt_mc2b(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), c.size - 1,
        float(alpha), b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return b
