"""Spherical-harmonic spectral filtering of background fields (SHSF).

TPU-native counterpart of the reference SHSF.py (reference SHSF.py:10-33):
expand the gridded field in spherical harmonics, triangular-truncate at Lmax,
and resynthesize -- the NCL shaec / tri_trunc / shsec pipeline used to smooth
(u, v) before ray tracing (manual section 7; example Lmax ~ 180/dphi - 1).

The reference delegates to pyshtools (absent here). This implementation is
self-contained and TPU-friendly: longitude is handled by a real FFT and the
latitude direction by dense Legendre matrices, so the whole filter is two
batched matmuls around an FFT -- MXU work, jit-able, no host callbacks.

Two analysis modes:

- ``mode='projection'`` (default; works on ANY ascending latitude grid,
  including the pipeline's pole-to-pole grids): per zonal wavenumber m the
  coefficients are the least-squares projection of the FFT coefficients onto
  normalized associated Legendre functions up to Lmax (pseudo-inverse,
  computed once on host and cached). For band-limited fields this equals
  truncate-after-full-expansion; for general fields it is the orthogonal
  projection onto the truncated basis.
- ``mode='dh'`` (requires a Driscoll & Healy sampled grid: N equally spaced
  colatitudes pi*j/N, j=0..N-1, N even -- north pole included, south pole
  excluded): exact DH quadrature analysis, the algorithm behind pyshtools
  SHExpandDH/MakeGridDH that the reference delegates to (SHSF.py:23-33).
  Coefficients of a field band-limited below N/2 are recovered EXACTLY
  (sampling theorem); rough fields get the same aliased coefficients
  pyshtools computes, so truncation results are comparable file-to-file.

The two modes differ on non-band-limited input (projection is optimal in the
grid's l2 sense; DH quadrature aliases degrees >= N/2 onto retained ones);
tests/test_spectral_dh.py quantifies the gap.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def normalized_legendre(x: np.ndarray, lmax: int, m: int) -> np.ndarray:
    """Normalized associated Legendre functions p̄_l^m(x), l = m..lmax.

    Normalization: integral over [-1, 1] of p̄_l^m p̄_l'^m dx = delta_ll'.
    Stable three-term recursion. Returns (len(x), lmax - m + 1).
    """
    x = np.asarray(x, np.float64)
    s = np.sqrt(np.maximum(0.0, 1.0 - x * x))
    # p̄_m^m
    pmm = np.full_like(x, np.sqrt(0.5))
    for k in range(1, m + 1):
        pmm = pmm * s * np.sqrt((2 * k + 1) / (2.0 * k))
    cols = [pmm]
    if lmax > m:
        cols.append(np.sqrt(2 * m + 3.0) * x * pmm)
    for l in range(m + 2, lmax + 1):
        a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
        b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
        cols.append(a * (x * cols[-1] - b * cols[-2]))
    return np.stack(cols, axis=-1)


@functools.lru_cache(maxsize=8)
def _filter_matrices(lat_key, lmax: int):
    """Per-m latitude filter matrices F_m = S_m @ pinv(S_m), stacked.

    lat_key: tuple of latitudes (radians). Returns (m_count, nlat, nlat)
    float64 numpy array, where F_m projects a latitude profile onto the
    Legendre basis of degrees m..lmax.
    """
    lat = np.asarray(lat_key)
    x = np.sin(lat)
    mats = []
    for m in range(lmax + 1):
        s = normalized_legendre(x, lmax, m)  # (nlat, lmax-m+1)
        f = s @ np.linalg.pinv(s, rcond=1e-10)
        mats.append(f)
    return np.stack(mats)  # (lmax+1, nlat, nlat)


def dh_weights(n: int) -> np.ndarray:
    """Driscoll & Healy (1994) quadrature weights for colatitudes
    theta_j = pi*j/n, j = 0..n-1 (n even).

    Exact for the latitude integrals of fields band-limited below n/2:
    sum_j w_j g(cos theta_j) = integral_{-1}^{1} g(x) dx for the relevant
    trigonometric-degree class. The defining property sum_j w_j P_l(x_j)
    = 2*delta_{l0} for l < n is asserted in tests/test_spectral_dh.py
    against numpy's Legendre polynomials (an independent implementation).
    """
    j = np.arange(n)
    theta = np.pi * j / n
    k = np.arange(n // 2)
    # w_j = (4/n) sin(theta_j) sum_k sin((2k+1) theta_j) / (2k+1)
    s = np.sin(np.outer(theta, 2 * k + 1)) / (2 * k + 1)
    return (4.0 / n) * np.sin(theta) * s.sum(axis=1)


def _is_dh_grid(lat: np.ndarray) -> bool:
    n = lat.shape[0]
    if n % 2:
        return False
    want = np.pi / 2 - np.pi * np.arange(n)[::-1] / n  # ascending
    # Absorb float32-stored coordinates (~1.2e-7 rad rounding near pi/2 --
    # same policy as basic_state._check_uniform_axis). The filter matrices
    # are built from the ideal DH angles, so accepting rounded coords is
    # exact; the nearest non-DH uniform grid differs by O(pi/n^2) >> 1e-6.
    return bool(np.allclose(lat, want, atol=1e-6))


@functools.lru_cache(maxsize=8)
def _dh_matrices(nlat: int, lmax: int):
    """Per-m DH filter matrices F_m = S_m @ (S_m^T W), stacked.

    Analysis: a_lm = sum_j w_j p̄_l^m(x_j) f_m(x_j) (exact DH quadrature of
    the orthonormal-Legendre inner product); synthesis: S_m a. Latitudes in
    DH order ascending (south-most first, north pole last).
    """
    theta = np.pi * np.arange(nlat) / nlat
    x = np.cos(theta)[::-1]  # ascending in latitude
    w = dh_weights(nlat)[::-1]
    mats = []
    for m in range(lmax + 1):
        s = normalized_legendre(x, lmax, m)  # (nlat, lmax-m+1)
        mats.append(s @ (s.T * w[None, :]))
    return np.stack(mats)  # (lmax+1, nlat, nlat)


def spectral_filter(field, lat, lmax: int, mode: str = "projection"):
    """Triangular-truncation spherical-harmonic filter.

    Args:
      field: (nlon, nlat) gridded data.
      lat: (nlat,) latitudes in radians, ascending.
      lmax: truncation degree (reference example: 180/dphi_deg - 1,
        SHSF.py:38).
      mode: 'projection' (any grid) or 'dh' (exact Driscoll & Healy
        quadrature; requires the DH grid -- see module docstring).

    Returns:
      (nlon, nlat) filtered field, same dtype.
    """
    field = jnp.asarray(field)
    nlon, nlat = field.shape
    m_count = min(lmax, nlon // 2) + 1

    if mode == "projection":
        mats = _filter_matrices(tuple(np.asarray(lat).tolist()), lmax)
    elif mode == "dh":
        if not _is_dh_grid(np.asarray(lat)):
            raise ValueError(
                "mode='dh' needs the Driscoll & Healy grid: nlat even, "
                "colatitudes pi*j/nlat (north pole included, south pole "
                "excluded); use mode='projection' for other grids"
            )
        mats = _dh_matrices(nlat, lmax)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    mats = jnp.asarray(mats[:m_count], field.dtype)

    fm = jnp.fft.rfft(field, axis=0)  # (nlon//2+1, nlat) complex
    keep = fm[:m_count]
    # Apply the per-m latitude projection: (m, nlat, nlat) x (m, nlat).
    filt_re = jnp.einsum("mij,mj->mi", mats, jnp.real(keep))
    filt_im = jnp.einsum("mij,mj->mi", mats, jnp.imag(keep))
    filt = filt_re + 1j * filt_im
    out = jnp.zeros(fm.shape, fm.dtype).at[:m_count].set(filt)
    return jnp.fft.irfft(out, n=nlon, axis=0).astype(field.dtype)


def shsf(data, lat, truncation_level: int, mode: str = "projection"):
    """Reference-shaped entry point (SHSF.py:10): filter one or more fields.

    data: (nlon, nlat) or (k, nlon, nlat). mode='dh' reproduces the
    reference's pyshtools SHExpandDH -> truncate -> MakeGridDH pipeline on
    DH-sampled grids.
    """
    data = jnp.asarray(data)
    if data.ndim == 2:
        return spectral_filter(data, lat, truncation_level, mode)
    return jnp.stack(
        [spectral_filter(d, lat, truncation_level, mode) for d in data])
