"""Robustness properties on random rough backgrounds: the tracer never
raises, dead rays stay dead, and live values stay physical."""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig

HOUR, DAY = 3600.0, 86400.0


def test_nan_hole_background_matches_reference(jet_field):
    """Golden differential on a background containing a NaN hole (missing
    data): trajectories and NaN masks must match the reference, whose RHS
    gets its NaNs from raw IEEE propagation. Pins the per-row NaN-union
    reconstruction in models/ray.py _rhs_core (the autodiff-hygiene path
    applies NaN as final selects instead of letting it propagate)."""
    from refshim import run_reference_wr

    u, v, lat, lon = jet_field
    u = u.copy()
    v = v.copy()
    # A hole in the northern mid-latitudes, in the path of the rays.
    u[10:14, 24:27] = np.nan
    v[11:13, 25:26] = np.nan

    case = dict(zwn=(3.0, 5.0), sw_lon=300.0, sw_lat=20.0, dlon=30.0,
                dlat=10.0, nnx=4, nny=2, tstep=2 * HOUR, ttotal=3 * DAY)
    ref = run_reference_wr(u, v, lat, lon, inte_method="", **case)
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    cfg = RunConfig(integrator="rk4", cal_dtype="float64", **case)
    traj = rt.trace_rays(bs, cfg)

    # Slot-aware comparison (canonical vs reference slot order is the known
    # deliberate divergence); gates: sub-0.01-degree RMSE, <1% alive/dead
    # mask mismatch.
    from test_trajectories import _compare

    rmse, frac = _compare(ref, traj, rmse_deg_gate=1e-2,
                          nan_mismatch_frac=0.01)
    print(f"NaN-hole RK4 RMSE {rmse:.2e} deg, nan mismatch {frac:.3%}")
    # The hole must actually have killed someone, or the test is vacuous.
    ours_n = np.isnan(np.asarray(traj.lat))
    assert ours_n[-1].sum() > ours_n[0].sum()


def _rough_background(seed):
    rng = np.random.default_rng(seed)
    nlon, nlat = 48, 25
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    # Rough, strong, partly easterly flow: plenty of kills and rootless
    # lanes.
    u = (rng.normal(0, 15, (nlon, nlat))
         + 40.0 * np.cos(lat)[None, :] * rng.uniform(-0.5, 1.5))
    v = rng.normal(0, 8, (nlon, nlat))
    return rt.prepare(u, v, lat, lon, cal_dtype="float64")


_ROUGH_CFG = dict(
    zwn=(1.0, 4.0, 7.0), sw_lon=0.0, sw_lat=-40.0, dlon=60.0, dlat=20.0,
    nnx=4, nny=5, tstep=2 * HOUR, ttotal=3 * DAY,
    integrator="rk45", cal_dtype="float64",
)


@pytest.mark.parametrize("mode", [{}, {"bound_mode": "dense",
                                       "pin_limit": 500, "pin_mwn": 0.0}],
                         ids=["exact", "pinned"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_backgrounds_nan_discipline(seed, mode):
    """Default (exact) and production (dense + pin500/attempts-only)
    configurations on rough backgrounds: neither raises (the truncation
    gate must not false-positive on the plentiful killed lanes, whose
    carried t is stale -- they are excluded by aliveness), and NaN
    discipline holds in both."""
    bs = _rough_background(seed)
    cfg = RunConfig(**dict(_ROUGH_CFG, **mode))
    traj = rt.trace_rays(bs, cfg)

    amp = np.asarray(traj.amp)
    lat_t = np.asarray(traj.lat)
    lon_t = np.asarray(traj.lon)

    # Dead rays stay dead: once amp goes NaN it never comes back.
    dead = ~np.isfinite(amp)
    resurrect = dead[:-1] & ~dead[1:]
    assert not resurrect.any(), "a dead ray came back to life"

    # Live positions stay physical.
    ok = np.isfinite(lat_t)
    assert (np.abs(lat_t[ok]) <= np.pi / 2 + 1e-9).all()
    assert np.isfinite(lon_t[ok]).all()
    # Live amp rows always have live positions.
    assert np.isfinite(lat_t[np.isfinite(amp)]).all()
