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


def test_turning_latitude_matches_theory(superrotation_bs):
    """A stationary ray with zonal wavenumber k turns where Ks(lat) = k
    (Hoskins & Karoly 1981, section 5). For u = U0 cos(lat) super-rotation
    Ks = Ks(0) cos(lat), so the turning latitude is arccos(k / Ks(0)):
    the ray's poleward excursion must peak there and never pass it."""
    from rwrt_tpu.constants import omega, rearth

    u0, k = 30.0, 4.0
    ks0 = rearth * np.sqrt(2.0 * (omega + u0 / rearth) / (rearth * u0))
    lat_turn = np.degrees(np.arccos(k / ks0))

    cfg = RunConfig(
        zwn=(k,), sw_lon=0.0, sw_lat=10.0, dlon=1.0, dlat=1.0, nnx=1, nny=1,
        tstep=2 * HOUR, ttotal=30 * DAY, integrator="rk45",
        cal_dtype="float64",
    )
    traj = rt.trace_rays(superrotation_bs, cfg)
    lat = np.degrees(np.asarray(traj.lat)[:, :, 0, 0])

    checked = 0
    for r in range(3):
        la = lat[:, r]
        la = la[np.isfinite(la)]
        # Only rays that actually propagate poleward approach the turning
        # point; the root with initial l < 0 heads equatorward first but
        # still turns at the mirror latitude, so |lat| covers both.
        if la.size < 50 or np.ptp(la) < 5.0:
            continue
        peak = np.abs(la).max()
        assert peak <= lat_turn + 0.5, (
            f"root {r} crossed the turning latitude: {peak:.2f} > {lat_turn:.2f}"
        )
        assert peak >= lat_turn - 2.0, (
            f"root {r} never reached the turning latitude: "
            f"{peak:.2f} vs {lat_turn:.2f}"
        )
        checked += 1
    assert checked >= 1, "no propagating root found"


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


def test_critical_latitude_absorption():
    """Critical-line absorption (Hoskins & Ambrizzi 1993): in u = U0*sin(lat)
    the zonal wind vanishes at the equator, so Ks -> inf there and an
    equatorward stationary ray must asymptote to the critical latitude
    WITHOUT crossing it, its meridional wavenumber growing without bound and
    its meridional group velocity collapsing (absorbed, not transmitted)."""
    nlon, nlat = 96, 49
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    u = 20.0 * np.sin(lat)[None, :] * np.ones((nlon, 1))
    v = np.zeros((nlon, nlat))
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")

    cfg = RunConfig(
        zwn=(4.0,), sw_lon=0.0, sw_lat=40.0, dlon=1.0, dlat=1.0, nnx=1,
        nny=1, tstep=2 * HOUR, ttotal=40 * DAY, integrator="rk45",
        cal_dtype="float64",
    )
    traj = rt.trace_rays(bs, cfg)
    latd = np.degrees(np.asarray(traj.lat))[:, :, 0, 0]
    ky = np.asarray(traj.ky)[:, :, 0, 0]
    vg = np.asarray(traj.vg)[:, :, 0, 0]

    checked = 0
    for r in range(3):
        if not np.isfinite(ky[0, r]) or abs(ky[0, r]) < 1e-6:
            continue
        fin = np.isfinite(latd[:, r])
        assert fin[0]
        # Never crosses the critical latitude (the equator).
        assert np.nanmin(latd[:, r]) > 0.0
        # Absorbed: |ky| grows without bound as the ray stalls...
        last = np.flatnonzero(fin)[-1]
        assert abs(ky[last, r]) > 5.0 * abs(ky[0, r])
        # ...and the meridional group velocity collapses.
        assert abs(vg[last, r]) < 0.2 * abs(vg[0, r])
        checked += 1
    # Both non-zero roots (equatorward, and poleward-reflected-back) count.
    assert checked == 2
