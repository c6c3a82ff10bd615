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


def initial_roots_reference_order(fmu, fmv, fmqx, fmqy, freq, zwn):
    """Initial meridional-wavenumber roots in the reference's exact slot
    layout (``RunConfig.root_order == 'fortran'``).

    Replicates cal_ky_numpy with the np.roots backend plus
    change_roots_order (reference bs.py:985-1040, 942-982) verbatim: the
    reference's slot layout depends on the eigenvalue ordering LAPACK emits
    inside np.roots (change_roots_order is NOT permutation-invariant), so
    slot-exact parity with reference output files is only achievable by
    calling np.roots itself. This runs once on host at initialization -- the
    device hot path is untouched.

    Args:
      fmu, fmv, fmqx, fmqy: (nsource,) Mercator background at the sources.
      freq: scalar wave frequency (rad/s).
      zwn: (nzwn,) initial zonal wavenumbers.

    Returns:
      (nsource, nzwn, 3) roots, NaN-padded, reference slot order.
    """
    import jax.numpy as jnp

    from rwrt_tpu.constants import delt, rearth
    from rwrt_tpu.ops.cubic import fortran_slot_order

    fmu = np.asarray(fmu, np.float64)
    fmv = np.asarray(fmv, np.float64)
    fmqx = np.asarray(fmqx, np.float64)
    fmqy = np.asarray(fmqy, np.float64)
    zwn = np.asarray(zwn, np.float64)
    ns, nz = fmu.shape[0], zwn.shape[0]
    raw = np.full((ns, nz, 3), np.nan)   # np.roots emission order
    counts = np.zeros((ns, nz), np.int32)
    for zi, k in enumerate(zwn):
        if k == 0.0:
            continue
        ps = freq / k * rearth
        # LOWEST-degree-first coefficient stack [c0, c1, c2, c3] with
        # c3 = fmv the m^3 term (reference bs.py:1006-1011): the trailing-
        # entry degree reduction below strips leading (highest-degree)
        # coefficients, and the [::-1] before np.roots flips to the
        # highest-first order np.roots expects.
        coeff_ = np.stack([
            (k ** 3) * (fmu - ps - fmqy / k ** 2),
            (k ** 2) * fmv + fmqx,
            k * (fmu - ps),
            fmv,
        ], axis=-1)
        for si in range(ns):
            coeff = coeff_[si]
            # Exact-zero trailing-entry reduction (bs.py:1017-1021 -- the
            # reference's numpy dialect tests == 0, not < delt).
            deg = 3
            while deg > 0 and abs(coeff[deg]) == 0:
                deg -= 1
            if deg < 1 or np.any(~np.isfinite(coeff[: deg + 1])):
                continue
            # roots_(coeff[::-1] + 0j) with the numpy backend (bs.py:1029).
            r = np.roots(coeff[: deg + 1][::-1].astype(np.complex128))
            real = [x.real for x in r if abs(x.imag) < delt]
            raw[si, zi, : min(len(real), 3)] = real[:3]
            counts[si, zi] = len(real)
    # The slot shuffle itself is the (golden-tested) vectorized
    # fortran_slot_order; the |m| > 100 NaN filter runs AFTER the swaps in
    # the reference (bs.py:978-981), equivalently applied after the reversal
    # here since it is elementwise.
    out = np.asarray(fortran_slot_order(jnp.asarray(raw), jnp.asarray(counts)))
    return np.where(np.abs(out) > 100.0, np.nan, out)
