"""ctypes bridge to the native dequant library (native/lcg_dequant.cpp).

The reference's ggml does block dequantization in C with SIMD; here the
device-side path is fused Pallas dequant-matmul, but the HOST side (model
load: memmap → f32/bf16 staging → device_put) is bandwidth-bound Python.
This bridge compiles a small C++ thread-pool library on first use (g++ is
in the image; no pybind11 — plain C ABI via ctypes) and transparently
falls back to the numpy codecs when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "liblcg_dequant.so")


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "lcg_dequant.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-pthread",
             "-std=c++17", "-o", _SO_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("LCG_NO_NATIVE"):
            return None
        if not os.path.exists(_SO_PATH) or (
            os.path.exists(os.path.join(_NATIVE_DIR, "lcg_dequant.cpp"))
            and os.path.getmtime(_SO_PATH) < os.path.getmtime(os.path.join(_NATIVE_DIR, "lcg_dequant.cpp"))
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.lcg_dequant.restype = ctypes.c_int
            lib.lcg_dequant.argtypes = [
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.lcg_dequant_supported.restype = ctypes.c_int
            lib.lcg_dequant_supported.argtypes = [ctypes.c_int32]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def native_available(ggml_type: int) -> bool:
    lib = _load()
    return bool(lib and lib.lcg_dequant_supported(int(ggml_type)))


def native_dequantize(data: np.ndarray, ggml_type: int, n_blocks: int, qk: int,
                      n_threads: int | None = None) -> np.ndarray | None:
    """Dequantize raw block bytes → (n_blocks, qk) f32; None if unsupported."""
    lib = _load()
    if lib is None or not lib.lcg_dequant_supported(int(ggml_type)):
        return None
    data = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    out = np.empty(n_blocks * qk, np.float32)
    nt = n_threads or min(os.cpu_count() or 1, 16)
    rc = lib.lcg_dequant(
        int(ggml_type),
        data.ctypes.data_as(ctypes.c_void_p),
        n_blocks,
        out.ctypes.data_as(ctypes.c_void_p),
        nt,
    )
    if rc != 0:
        return None
    return out.reshape(n_blocks, qk)
