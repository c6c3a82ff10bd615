"""Robustness properties on random rough backgrounds: the tracer never
raises, dead rays stay dead, and live values stay physical."""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig

HOUR, DAY = 3600.0, 86400.0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_backgrounds_nan_discipline(seed):
    rng = np.random.default_rng(seed)
    nlon, nlat = 48, 25
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    # Rough, strong, partly easterly flow: plenty of kills and rootless
    # lanes.
    u = (rng.normal(0, 15, (nlon, nlat))
         + 40.0 * np.cos(lat)[None, :] * rng.uniform(-0.5, 1.5))
    v = rng.normal(0, 8, (nlon, nlat))
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")

    cfg = RunConfig(
        zwn=(1.0, 4.0, 7.0), sw_lon=0.0, sw_lat=-40.0, dlon=60.0, dlat=20.0,
        nnx=4, nny=5, tstep=2 * HOUR, ttotal=3 * DAY,
        integrator="rk45", cal_dtype="float64",
    )
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
