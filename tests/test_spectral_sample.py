"""Tensor-basis (MXU) background sampling: fit exactness, accuracy vs
bilinear, and the fused Pallas kernel (interpreter mode on CPU).

The module under test is the opt-in "replace gather with matmul" sampler
(ops/spectral_sample.py); see docs/DESIGN.md section 4 for why the bilinear
gather stays the default (golden parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwrt_tpu.models import basic_state
from rwrt_tpu.ops import interp
from rwrt_tpu.ops.spectral_sample import (
    fit_spectral,
    fit_spectral_time,
    lerp_coeffs,
    sample_mercator_spectral,
    sample_spectral,
    sample_spectral_pallas,
)


def _grid(nlon, nlat):
    dx = 2 * np.pi / nlon
    dy = np.pi / (nlat - 1)
    lon = np.arange(nlon) * dx
    lat = -np.pi / 2 + np.arange(nlat) * dy
    return lon, lat


def test_full_truncation_reproduces_grid_values():
    """Full-truncation fit is an exact trig interpolant of the grid data."""
    rng = np.random.default_rng(0)
    nlon, nlat, c = 24, 13, 3
    lon, lat = _grid(nlon, nlat)
    fields = rng.normal(size=(nlon, nlat, c))
    sbg = fit_spectral(fields, lon=lon, lat=lat, dtype=jnp.float64)
    glon, glat = np.meshgrid(lon, lat, indexing="ij")
    out = sample_spectral(sbg, jnp.asarray(glon.ravel()), jnp.asarray(glat.ravel()))
    err = np.abs(np.asarray(out).reshape(nlon, nlat, c) - fields).max()
    assert err < 1e-11


def test_odd_nlon_roundtrip():
    """No-Nyquist (odd nlon) path is exact too."""
    rng = np.random.default_rng(1)
    nlon, nlat = 15, 9
    lon, lat = _grid(nlon, nlat)
    fields = rng.normal(size=(nlon, nlat, 2))
    sbg = fit_spectral(fields, lon=lon, lat=lat, dtype=jnp.float64)
    glon, glat = np.meshgrid(lon, lat, indexing="ij")
    out = sample_spectral(sbg, jnp.asarray(glon.ravel()), jnp.asarray(glat.ravel()))
    assert np.abs(np.asarray(out).reshape(nlon, nlat, 2) - fields).max() < 1e-11


def _band_limited(glon, glat):
    th = glat + np.pi / 2
    return (2.0 + np.cos(3 * glon) * np.cos(2 * th)
            - 0.5 * np.sin(5 * glon) * np.cos(4 * th))


def test_band_limited_beats_bilinear_off_grid():
    """On a band-limited field the spectral sample is exact off-grid while
    bilinear carries O(h^2) interpolation error — the gate the round-1 review
    asked for ("bit-tolerance vs bilinear"), made quantitative."""
    nlon, nlat = 36, 19
    lon, lat = _grid(nlon, nlat)
    glon, glat = np.meshgrid(lon, lat, indexing="ij")
    fields = _band_limited(glon, glat)[..., None]
    sbg = fit_spectral(fields, lon=lon, lat=lat, dtype=jnp.float64)

    rng = np.random.default_rng(2)
    plon = jnp.asarray(rng.uniform(0, 2 * np.pi, 800))
    plat = jnp.asarray(rng.uniform(-np.pi / 2, np.pi / 2, 800))
    truth = _band_limited(np.asarray(plon), np.asarray(plat))

    spec = np.asarray(sample_spectral(sbg, plon, plat))[:, 0]
    # Bilinear from the same stack (wrap column appended for cyclicity).
    wrapped = jnp.asarray(np.concatenate([fields, fields[:1]], axis=0))
    bilin = np.asarray(interp.sample_raw(
        wrapped, lon[0], lat[0], lon[1] - lon[0], lat[1] - lat[0],
        plon, plat))[:, 0]

    spec_err = np.abs(spec - truth).max()
    bilin_err = np.abs(bilin - truth).max()
    assert spec_err < 1e-10
    assert bilin_err > 1e-3  # bilinear is genuinely first-order here
    # And the two samplers agree within bilinear's own error budget.
    assert np.abs(spec - bilin).max() < 4 * bilin_err


def test_out_of_range_and_nan_semantics_match_sample_raw():
    nlon, nlat = 16, 9
    lon, lat = _grid(nlon, nlat)
    rng = np.random.default_rng(3)
    fields = rng.normal(size=(nlon, nlat, 2))
    sbg = fit_spectral(fields, lon=lon, lat=lat, dtype=jnp.float64)
    plon = jnp.asarray([0.3, jnp.nan, 1.0, 2.0])
    plat = jnp.asarray([0.2, 0.1, 1.8, jnp.nan])  # 1.8 > pi/2
    out = np.asarray(sample_spectral(sbg, plon, plat))
    assert np.isfinite(out[0]).all()
    assert np.isnan(out[1]).all()  # NaN lon propagates
    assert np.isnan(out[2]).all()  # |lat| > pi/2 masked
    assert np.isnan(out[3]).all()  # NaN lat propagates


def test_lon_periodicity_no_wrap_needed():
    nlon, nlat = 16, 9
    lon, lat = _grid(nlon, nlat)
    rng = np.random.default_rng(4)
    fields = rng.normal(size=(nlon, nlat, 1))
    sbg = fit_spectral(fields, lon=lon, lat=lat, dtype=jnp.float64)
    plat = jnp.full((4,), 0.3)
    base = sample_spectral(sbg, jnp.asarray([0.5, 1.0, 2.0, 3.0]), plat)
    shifted = sample_spectral(
        sbg, jnp.asarray([0.5, 1.0, 2.0, 3.0]) + 4 * np.pi, plat)
    np.testing.assert_allclose(np.asarray(base), np.asarray(shifted),
                               rtol=0, atol=1e-10)


def test_fit_from_basic_state_drops_wrap_column():
    """Fitting a BasicState handles the cyclic wrap column and nonzero
    truncation; the truncated representation converges on a smooth jet."""
    nlon, nlat = 48, 25
    lon, lat = _grid(nlon, nlat)
    glat = lat[None, :] * np.ones((nlon, 1))
    glon = lon[:, None] * np.ones((1, nlat))
    u = 15.0 * np.cos(glat) ** 2 + 2.0 * np.cos(2 * glon) * np.cos(glat) ** 4
    v = 1.5 * np.sin(glon) * np.cos(glat) ** 3
    bs = basic_state.prepare(u, v, cal_dtype=jnp.float64)
    assert bs.fields.shape[0] == nlon + 1  # wrap present

    full = fit_spectral(bs)
    rng = np.random.default_rng(5)
    plon = jnp.asarray(rng.uniform(0, 2 * np.pi, 400))
    plat = jnp.asarray(rng.uniform(-1.2, 1.2, 400))
    ref = np.asarray(sample_spectral(full, plon, plat))

    errs = []
    for l_max in (6, 12, 25):
        sb = fit_spectral(bs, m_max=min(10, nlon // 2), l_max=l_max)
        out = np.asarray(sample_spectral(sb, plon, plat))
        errs.append(np.nanmax(np.abs(out - ref)))
    assert errs[2] < errs[0]  # refinement converges toward the full fit
    # The u channel of the stack is the analytic wind at grid points and is
    # band-limited in this basis, so the full fit reproduces it exactly while
    # bilinear carries its O(h^2) error (~0.1 m/s at this resolution).
    th = np.asarray(plat) + np.pi / 2
    u_truth = (15.0 * np.sin(th) ** 2
               + 2.0 * np.cos(2 * np.asarray(plon)) * np.sin(th) ** 4)
    bilin = np.asarray(interp.sample_raw(
        bs.fields, float(bs.lon[0]), float(bs.lat[0]), float(bs.dx),
        float(bs.dy), plon, plat))
    spec_err = np.nanmax(np.abs(ref[:, 0] - u_truth))
    bilin_err = np.nanmax(np.abs(bilin[:, 0] - u_truth))
    # prepare() ingests through float32 by default (reference bs.py:70-81),
    # so the floor is f32 rounding of u (~2e-6 m/s), not the fit.
    assert spec_err < 1e-5
    assert spec_err < bilin_err


def test_pallas_kernel_matches_reference_eval():
    nlon, nlat = 36, 19
    lon, lat = _grid(nlon, nlat)
    rng = np.random.default_rng(6)
    fields = rng.normal(size=(nlon, nlat, 12))
    sbg = fit_spectral(fields, lon=lon, lat=lat, dtype=jnp.float64)
    plon = jnp.asarray(rng.uniform(0, 2 * np.pi, 700))  # non-multiple of block
    plat = jnp.asarray(rng.uniform(-np.pi / 2, np.pi / 2, 700))
    ref = np.asarray(sample_spectral(sbg, plon, plat))
    out = np.asarray(sample_spectral_pallas(sbg, plon, plat, block_r=256,
                                            interpret=True))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-11)


def test_pallas_kernel_polar_mask_and_nan():
    nlon, nlat = 16, 9
    lon, lat = _grid(nlon, nlat)
    fields = np.ones((nlon, nlat, 2))
    sbg = fit_spectral(fields, lon=lon, lat=lat, dtype=jnp.float64)
    plon = jnp.asarray([0.1, 0.2, jnp.nan])
    plat = jnp.asarray([0.0, 2.0, 0.1])
    out = np.asarray(sample_spectral_pallas(sbg, plon, plat, interpret=True))
    assert np.isfinite(out[0]).all()
    assert np.isnan(out[1]).all()
    assert np.isnan(out[2]).all()


def test_mercator_spectral_matches_gather_path_on_smooth_field():
    """End-to-end Mercator sample: spectral vs the production gather path
    agree within the bilinear error budget on a smooth background."""
    nlon, nlat = 64, 33
    lon, lat = _grid(nlon, nlat)
    glat = lat[None, :] * np.ones((nlon, 1))
    u = 20.0 * np.cos(glat) ** 2
    v = np.zeros_like(u)
    bs = basic_state.prepare(u, v, cal_dtype=jnp.float64)
    sbg = fit_spectral(bs)

    rng = np.random.default_rng(7)
    plon = jnp.asarray(rng.uniform(0, 2 * np.pi, 300))
    plat = jnp.asarray(rng.uniform(-1.3, 1.3, 300))
    spec = np.asarray(sample_mercator_spectral(sbg, plon, plat))
    gath = np.asarray(interp.sample_mercator(
        bs.fields, float(bs.lon[0]), float(bs.lat[0]), float(bs.dx),
        float(bs.dy), plon, plat))
    # Relative agreement on the hot fields, scaled per-channel.
    for ch in range(12):
        scale = max(np.nanmax(np.abs(gath[ch])), 1e-12)
        gap = np.nanmax(np.abs(spec[ch] - gath[ch])) / scale
        assert gap < 0.02, (ch, gap)


def test_fit_validates_truncation_bounds():
    fields = np.zeros((8, 5, 1))
    lon, lat = _grid(8, 5)
    with pytest.raises(ValueError):
        fit_spectral(fields, lon=lon, lat=lat, m_max=5)
    with pytest.raises(ValueError):
        fit_spectral(fields, lon=lon, lat=lat, l_max=0)


def test_time_varying_fit_lerp_equals_fit_of_lerped_fields():
    """Coefficient lerp == fitting lerped fields (the transform is linear) —
    the same exactness argument as the production time lerp."""
    rng = np.random.default_rng(9)
    nlon, nlat, c, t = 16, 9, 2, 3
    lon, lat = _grid(nlon, nlat)
    frames = rng.normal(size=(t, nlon, nlat, c))
    sbg_t = fit_spectral_time(frames, lon=lon, lat=lat, dtype=jnp.float64)
    assert sbg_t.coeffs.ndim == 4 and sbg_t.coeffs.shape[0] == t

    tfrac = 1.3
    blended = (1 - 0.3) * frames[1] + 0.3 * frames[2]
    direct = fit_spectral(blended, lon=lon, lat=lat, dtype=jnp.float64)
    lerped = lerp_coeffs(sbg_t, tfrac)
    np.testing.assert_allclose(np.asarray(lerped.coeffs),
                               np.asarray(direct.coeffs), rtol=0, atol=1e-12)

    plon = jnp.asarray(rng.uniform(0, 2 * np.pi, 100))
    plat = jnp.asarray(rng.uniform(-1.4, 1.4, 100))
    a = np.asarray(sample_spectral(lerped, plon, plat))
    b = np.asarray(sample_spectral(direct, plon, plat))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
    # Edge hold: tfrac clamps to the frame range.
    lo = lerp_coeffs(sbg_t, -2.0)
    np.testing.assert_allclose(np.asarray(lo.coeffs),
                               np.asarray(sbg_t.coeffs[0]), rtol=0, atol=0)
    hi = lerp_coeffs(sbg_t, 99.0)
    np.testing.assert_allclose(np.asarray(hi.coeffs),
                               np.asarray(sbg_t.coeffs[-1]), rtol=0, atol=0)


def test_fit_spectral_routes_time_varying_basic_state():
    """fit_spectral on a time-varying BasicState fits per-frame (it must NOT
    treat the time axis as longitude/wrap)."""
    rng = np.random.default_rng(11)
    t, nlon, nlat = 3, 16, 9
    u = rng.normal(size=(t, nlon, nlat)) + 10.0
    v = rng.normal(size=(t, nlon, nlat))
    bs = basic_state.prepare_time_varying(u, v, bg_t0=0.0, bg_dt=3600.0,
                                          cal_dtype=jnp.float64)
    sbg = fit_spectral(bs)
    assert sbg.coeffs.ndim == 4 and sbg.coeffs.shape[0] == t
    # Frame 1 coefficients == fitting frame 1's stack directly.
    direct = fit_spectral(np.asarray(bs.fields[1]), xcyclic=True,
                          dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(sbg.coeffs[1]),
                               np.asarray(direct.coeffs), rtol=0, atol=1e-12)
    # Raw 4-D arrays must be explicit.
    with pytest.raises(ValueError):
        fit_spectral(np.zeros((2, 8, 5, 1)))


def test_lerp_coeffs_rejects_static_fit():
    lon, lat = _grid(8, 5)
    sbg = fit_spectral(np.zeros((8, 5, 1)), lon=lon, lat=lat)
    with pytest.raises(ValueError):
        lerp_coeffs(sbg, 0.5)


def test_bfloat16_matmul_option():
    """bf16 contraction (full-rate MXU mode) stays within bf16 error of the
    f32 result and keeps NaN propagation."""
    rng = np.random.default_rng(10)
    nlon, nlat = 24, 13
    lon, lat = _grid(nlon, nlat)
    fields = rng.normal(size=(nlon, nlat, 4)).astype(np.float32)
    sbg = fit_spectral(fields, lon=lon, lat=lat)
    plon = jnp.asarray(rng.uniform(0, 2 * np.pi, 300), jnp.float32)
    plat = jnp.asarray(rng.uniform(-1.4, 1.4, 300), jnp.float32)
    f32 = np.asarray(sample_spectral(sbg, plon, plat))
    bf = np.asarray(sample_spectral(sbg, plon, plat,
                                    matmul_dtype=jnp.bfloat16))
    scale = np.abs(f32).max()
    assert np.abs(bf - f32).max() / scale < 0.03  # bf16 has ~8 mantissa bits
    bfp = np.asarray(sample_spectral_pallas(sbg, plon, plat,
                                            matmul_dtype=jnp.bfloat16,
                                            interpret=True))
    assert np.abs(bfp - f32).max() / scale < 0.03
    # NaN lanes still propagate through the bf16 cast.
    out = np.asarray(sample_spectral(
        sbg, jnp.asarray([jnp.nan], jnp.float32),
        jnp.asarray([0.1], jnp.float32), matmul_dtype=jnp.bfloat16))
    assert np.isnan(out).all()


def test_float32_coefficients_for_production_dtype():
    nlon, nlat = 16, 9
    lon, lat = _grid(16, 9)
    rng = np.random.default_rng(8)
    fields = rng.normal(size=(nlon, nlat, 2)).astype(np.float32)
    sbg = fit_spectral(fields, lon=lon, lat=lat)
    assert sbg.coeffs.dtype == jnp.float32
    plon = jnp.asarray(rng.uniform(0, 2 * np.pi, 50), jnp.float32)
    plat = jnp.asarray(rng.uniform(-1.2, 1.2, 50), jnp.float32)
    a = np.asarray(sample_spectral(sbg, plon, plat))
    b = np.asarray(sample_spectral_pallas(sbg, plon, plat, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_cell_centered_grid_exact_even_nlon():
    """Grid-point exactness holds when lon[0] != 0 (cell-centered grid).

    The lon0 phase fold rotates the raw (real) Nyquist coefficient into the
    sin component; dropping it (the original b[n//2]=0) cost O(1) grid-point
    error on offset grids with even nlon.
    """
    rng = np.random.default_rng(11)
    nlon, nlat = 8, 7
    dx = 2 * np.pi / nlon
    lon = dx / 2 + np.arange(nlon) * dx
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    fields = rng.normal(size=(nlon, nlat, 2))
    sbg = fit_spectral(fields, lon=lon, lat=lat, dtype=jnp.float64)
    glon, glat = np.meshgrid(lon, lat, indexing="ij")
    out = sample_spectral(sbg, jnp.asarray(glon.ravel()),
                          jnp.asarray(glat.ravel()))
    assert np.abs(np.asarray(out).reshape(nlon, nlat, 2) - fields).max() < 1e-11


def test_pallas_sampler_under_jit():
    """The fused kernel is jittable with a traced SpectralBackground (lat0
    must not be baked in as a Python float): the documented time-varying
    flow jits lerp_coeffs + sampler in one step function."""
    rng = np.random.default_rng(12)
    nlon, nlat = 16, 9
    lon, lat = _grid(nlon, nlat)
    frames = rng.normal(size=(2, nlon, nlat, 2))
    sbg_t = fit_spectral_time(frames, lon=lon, lat=lat, dtype=np.float64)
    plon = jnp.asarray(rng.uniform(0, 2 * np.pi, 40))
    plat = jnp.asarray(rng.uniform(-1.3, 1.3, 40))

    @jax.jit
    def step(sbg_t, tfrac, plon, plat):
        sbg = lerp_coeffs(sbg_t, tfrac)
        return sample_spectral_pallas(sbg, plon, plat, interpret=True)

    out = np.asarray(step(sbg_t, 0.25, plon, plat))
    ref = np.asarray(sample_spectral(lerp_coeffs(sbg_t, 0.25), plon, plat))
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_time_varying_fit_properties():
    """m_max/l_max/num_fields read the trailing axes, so they are correct on
    the (T, Mp, L, C) stacks of fit_spectral_time too."""
    rng = np.random.default_rng(13)
    nlon, nlat = 16, 9
    lon, lat = _grid(nlon, nlat)
    frames = rng.normal(size=(3, nlon, nlat, 4))
    sbg_t = fit_spectral_time(frames, m_max=5, l_max=7, lon=lon, lat=lat)
    assert sbg_t.m_max == 5
    assert sbg_t.l_max == 7
    assert sbg_t.num_fields == 4
    sbg = fit_spectral(frames[0], m_max=5, l_max=7, lon=lon, lat=lat)
    assert (sbg.m_max, sbg.l_max, sbg.num_fields) == (5, 7, 4)
