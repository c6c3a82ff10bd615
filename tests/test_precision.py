"""float32 drift quantification: the TPU runs in f32; golden parity is
established in f64. This test bounds the f32-vs-f64 trajectory divergence
well inside the 0.1 deg acceptance gate (BASELINE.md)."""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig

HOUR, DAY = 3600.0, 86400.0

CFG = dict(
    zwn=(2.0, 4.0), sw_lon=10.0, sw_lat=15.0, dlon=60.0, dlat=10.0,
    nnx=3, nny=2, tstep=2 * HOUR, ttotal=10 * DAY,
)


@pytest.mark.parametrize("integrator", ["rk4", "rk45"])
def test_f32_trajectory_drift(jet_field, integrator):
    u, v, lat, lon = jet_field
    bs64 = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    bs32 = rt.prepare(u, v, lat, lon, cal_dtype="float32")

    t64 = rt.trace_rays(bs64, RunConfig(integrator=integrator,
                                        cal_dtype="float64", **CFG))
    t32 = rt.trace_rays(bs32, RunConfig(integrator=integrator,
                                        cal_dtype="float32", **CFG))

    la64, la32 = np.asarray(t64.lat), np.asarray(t32.lat)
    lo64, lo32 = np.asarray(t64.lon), np.asarray(t32.lon)
    both = np.isfinite(la64) & np.isfinite(la32)
    assert both.sum() > 0.5 * np.isfinite(la64).sum()

    dlat = la64[both] - la32[both]
    dlon = (lo64[both] - lo32[both] + np.pi) % (2 * np.pi) - np.pi
    rmse = np.degrees(np.sqrt(np.mean(dlat**2 + (dlon * np.cos(la64[both])) ** 2)))
    # f32 drift must stay well below the 0.1 deg acceptance gate.
    assert rmse < 0.05, f"{integrator}: f32 drift RMSE {rmse:.4f} deg"

    # alive/dead divergence should be modest
    frac = np.mean(np.isfinite(la64) != np.isfinite(la32))
    assert frac < 0.05, f"alive-mask divergence {frac:.3%}"
