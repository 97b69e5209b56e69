"""ctypes binding for the native scalar reference tracer (native/tracer.cpp).

Validation-oracle role (see native/tracer.cpp). Compiled on demand.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "tracer.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libtracer.so")

_lib = None


def _load():
    global _lib
    if _lib is None:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(["g++", "-O3", "-march=native", "-fopenmp",
                            "-shared", "-fPIC", _SRC, "-o", _LIB],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.trace_photons.restype = None
        lib.trace_photons.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_long, ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.float64),
            ctypes.c_void_p,
        ]
        _lib = lib
    return _lib


def trace(ext, ssa, dx, dy, dz, g, mu0, albedo, n_photons, seed=1,
          want_flux_up=False):
    """Run the scalar oracle. Returns dict with R, T, A fractions (+
    flux_up [nx, ny] if requested)."""
    lib = _load()
    ext = np.ascontiguousarray(ext, np.float64)
    ssa = np.ascontiguousarray(np.broadcast_to(ssa, ext.shape), np.float64)
    nx, ny, nz = ext.shape
    out = np.zeros(3)
    fu = np.zeros(nx * ny) if want_flux_up else None
    lib.trace_photons(nx, ny, nz, float(dx), float(dy), float(dz),
                      ext.reshape(-1), ssa.reshape(-1),
                      float(g), float(mu0), float(albedo),
                      int(n_photons), int(seed), out,
                      fu.ctypes.data if fu is not None else None)
    res = {"R": out[0] / n_photons, "T": out[1] / n_photons,
           "A": out[2] / n_photons}
    if want_flux_up:
        res["flux_up"] = fu.reshape(nx, ny)
    return res
