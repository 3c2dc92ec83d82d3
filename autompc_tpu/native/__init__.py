"""Native (C++) components with ctypes bindings.

The compiled random-forest surrogate fills the role pyrfr's C++ forest
plays inside SMAC in the reference stack. The shared library is built
on first use with the system compiler and cached next to the sources;
callers fall back to the pure-Python implementation when no compiler is
available (``NativeRandomForest.available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rf.cpp")
_LIB = os.path.join(_HERE, "librf.so")
_lock = threading.Lock()
_lib_handle: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                _SRC, "-o", _LIB,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib_handle, _build_failed
    with _lock:
        if _lib_handle is not None:
            return _lib_handle
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.ampc_rf_fit.restype = ctypes.c_void_p
        lib.ampc_rf_fit.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_ulong,
        ]
        lib.ampc_rf_predict.restype = None
        lib.ampc_rf_predict.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib.ampc_rf_free.restype = None
        lib.ampc_rf_free.argtypes = [ctypes.c_void_p]
        _lib_handle = lib
        return lib


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeRandomForest:
    """ctypes wrapper over the C++ forest; API-compatible with
    tuning.bo.RandomForestSurrogate."""

    def __init__(self, n_trees=24, max_depth=10, min_leaf=2, rng=None):
        self.n_trees = n_trees
        self.max_depth = max_depth
        self.min_leaf = min_leaf
        rng = rng or np.random.default_rng()
        self._seed = int(rng.integers(1 << 62))
        self._handle = None
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native RF library unavailable")

    @staticmethod
    def available() -> bool:
        return _load() is not None

    def fit(self, X: np.ndarray, y: np.ndarray):
        X = np.ascontiguousarray(X, dtype=np.float64)
        y = np.ascontiguousarray(y, dtype=np.float64)
        n, d = X.shape
        self._free()
        self._handle = self._lib.ampc_rf_fit(
            _as_c(X), _as_c(y), n, d,
            self.n_trees, self.max_depth, self.min_leaf,
            ctypes.c_ulong(self._seed),
        )
        self._d = d
        return self

    def predict(self, X: np.ndarray):
        if self._handle is None:
            raise RuntimeError("fit before predict")
        X = np.ascontiguousarray(X, dtype=np.float64)
        n, d = X.shape
        mean = np.empty(n, dtype=np.float64)
        std = np.empty(n, dtype=np.float64)
        self._lib.ampc_rf_predict(
            ctypes.c_void_p(self._handle), _as_c(X), n, d, _as_c(mean), _as_c(std)
        )
        return mean, std

    def _free(self):
        if self._handle is not None and self._lib is not None:
            self._lib.ampc_rf_free(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):
        try:
            self._free()
        except Exception:
            pass


def make_forest(n_trees=24, max_depth=10, min_leaf=2, rng=None, prefer_native=True):
    """Factory: native C++ forest when buildable, Python fallback
    otherwise."""
    if prefer_native and NativeRandomForest.available():
        return NativeRandomForest(n_trees, max_depth, min_leaf, rng)
    from ..tuning.bo import RandomForestSurrogate

    return RandomForestSurrogate(n_trees, max_depth, min_leaf, rng)
