"""Physics acceptance tests.

The reference's acceptance case (manual section 2, SURVEY.md section 4.3):
under an idealized super-rotation basic flow, stationary Rossby-wave rays
follow great circles (Hoskins & Karoly 1981).
"""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig

HOUR, DAY = 3600.0, 86400.0


@pytest.fixture(scope="module")
def superrotation_bs():
    """u = U0 * cos(lat) (solid-body super-rotation), v = 0."""
    nlon, nlat = 96, 49
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    u = 30.0 * np.cos(lat)[None, :] * np.ones((nlon, 1))
    v = np.zeros((nlon, nlat))
    return rt.prepare(u, v, lat, lon, cal_dtype="float64")


def test_great_circle_paths(superrotation_bs):
    """Rays seeded off-equator must trace near-great-circle paths: all
    trajectory points lie close to a fixed plane through Earth's center."""
    cfg = RunConfig(
        zwn=(4.0,), sw_lon=0.0, sw_lat=10.0, dlon=1.0, dlat=1.0, nnx=1, nny=1,
        tstep=1 * HOUR, ttotal=15 * DAY, integrator="rk45",
        cal_dtype="float64",
    )
    traj = rt.trace_rays(superrotation_bs, cfg)
    lon = np.asarray(traj.lon)[:, :, 0, 0]
    lat = np.asarray(traj.lat)[:, :, 0, 0]

    checked = 0
    for r in range(3):
        lo, la = lon[:, r], lat[:, r]
        ok = np.isfinite(lo) & np.isfinite(la)
        if ok.sum() < 50:
            continue
        lo, la = lo[ok], la[ok]
        # Require real propagation (not a stuck ray).
        if np.ptp(lo) < 0.5:
            continue
        xyz = np.stack([
            np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)
        ], axis=1)
        # Best-fit plane through origin: smallest singular vector.
        _, s, vt = np.linalg.svd(xyz, full_matrices=False)
        dist = np.abs(xyz @ vt[-1])  # sine of angular distance from plane
        assert np.degrees(np.arcsin(dist.max())) < 1.0, (
            f"root {r}: max deviation from great circle "
            f"{np.degrees(np.arcsin(dist.max())):.3f} deg"
        )
        checked += 1
    assert checked >= 1, "no propagating root found"


def test_stationary_wavenumber_on_superrotation(superrotation_bs):
    """For u = U0 cos(lat): beta_M = 2 cos^2(lat) (Omega + U0/R)/R, so
    Ks = R cos(lat) sqrt(2 (Omega + U0/R) / (R U0)) -- the classic
    super-rotation stationary wavenumber (Hoskins & Karoly 1981)."""
    from rwrt_tpu.constants import omega, rearth

    ks = np.asarray(superrotation_bs.ks)
    lat = np.asarray(superrotation_bs.lat)
    u0 = 30.0
    expected = (
        rearth * np.cos(lat) * np.sqrt(2.0 * (omega + u0 / rearth) / (rearth * u0))
    )[None, :]
    interior = ks[:, 5:-5]
    ok = np.isfinite(interior)
    assert ok.all()
    np.testing.assert_allclose(
        interior, np.broadcast_to(expected, ks.shape)[:, 5:-5], rtol=1e-2
    )


def test_rays_conserve_zonal_wavenumber_in_zonal_flow(superrotation_bs):
    """In a zonally-symmetric background, dk/dt = 0 along rays."""
    cfg = RunConfig(
        zwn=(3.0, 5.0), sw_lon=20.0, sw_lat=20.0, dlon=1.0, dlat=1.0,
        nnx=1, nny=1, tstep=2 * HOUR, ttotal=10 * DAY, integrator="rk4",
        cal_dtype="float64",
    )
    traj = rt.trace_rays(superrotation_bs, cfg)
    kx = np.asarray(traj.kx)
    for z, k0 in enumerate(cfg.zwn):
        vals = kx[:, :, 0, z]
        vals = vals[np.isfinite(vals)]
        np.testing.assert_allclose(vals, k0, rtol=1e-4)
