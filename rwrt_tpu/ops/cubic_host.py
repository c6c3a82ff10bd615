"""Host-side polynomial root backends (verification / arbitrary degree).

Counterpart of the reference's root backend dispatch (reference bs.py:62-66:
`roots_` selecting the Fortran .so or numba np.roots). The TPU compute path
never calls these -- it uses the closed-form device solve in ops/cubic.py --
but they exist for host-side cross-checks, for degree > 3 use, and for parity
with the reference's component inventory:

- ``roots_native``: the C++ Aberth-Ehrlich solver (rwrt_tpu/native/),
  built and loaded lazily; like the reference's `_cmplx_so_exist_` gate
  (bs.py:19-29), absence degrades to numpy with a one-time warning
  (bs.py:1050-1053).
- ``roots_numpy``: np.roots per row.
"""

from __future__ import annotations

import ctypes
import warnings

import numpy as np

from rwrt_tpu.native import build as _native_build

_warned = False


def roots_numpy(coeffs: np.ndarray) -> np.ndarray:
    """np.roots per row. coeffs: (batch, degree+1) highest-first -> complex
    roots (batch, degree) (rows with ~zero leading coeff get NaN padding)."""
    coeffs = np.atleast_2d(coeffs)
    batch, ncoef = coeffs.shape
    degree = ncoef - 1
    out = np.full((batch, degree), np.nan + 0j, dtype=np.complex128)
    for i in range(batch):
        r = np.roots(coeffs[i])
        out[i, : len(r)] = r
    return out


def roots_native(coeffs: np.ndarray, max_iter: int = 200,
                 tol: float = 1e-14) -> np.ndarray:
    """C++ batched Aberth-Ehrlich roots; falls back to numpy if the native
    library is unavailable."""
    global _warned
    lib = _native_build.load()
    coeffs = np.ascontiguousarray(np.atleast_2d(coeffs), dtype=np.complex128)
    if lib is None:
        if not _warned:
            warnings.warn(
                "native cpolyroots unavailable; falling back to numpy.roots"
            )
            _warned = True
        return roots_numpy(coeffs)

    batch, ncoef = coeffs.shape
    degree = ncoef - 1
    cre = np.ascontiguousarray(coeffs.real)
    cim = np.ascontiguousarray(coeffs.imag)
    rre = np.empty((batch, degree), dtype=np.float64)
    rim = np.empty((batch, degree), dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.cpoly_roots_batch(
        batch, degree,
        cre.ctypes.data_as(dp), cim.ctypes.data_as(dp),
        rre.ctypes.data_as(dp), rim.ctypes.data_as(dp),
        max_iter, tol,
    )
    return rre + 1j * rim


def solve_roots(coeffs: np.ndarray, backend: str = "native") -> np.ndarray:
    """Backend dispatch (reference roots_, bs.py:62-66)."""
    if backend == "native":
        return roots_native(coeffs)
    if backend == "numpy":
        return roots_numpy(coeffs)
    raise ValueError(f"unknown backend {backend!r}")
