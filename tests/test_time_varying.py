"""Time-varying background tests (BASELINE.json config 4) and ensembles."""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig
from rwrt_tpu.models.basic_state import prepare_time_varying

HOUR, DAY = 3600.0, 86400.0

CFG = dict(
    zwn=(2.0, 4.0), sw_lon=0.0, sw_lat=10.0, dlon=90.0, dlat=10.0,
    nnx=2, nny=2, tstep=2 * HOUR, ttotal=4 * DAY, cal_dtype="float64",
)


@pytest.mark.parametrize("integrator", ["rk4", "rk45"])
def test_constant_frames_equal_static(jet_field, integrator):
    """A time-varying background whose frames are identical must reproduce
    the static-background run exactly."""
    u, v, lat, lon = jet_field
    static = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    frames_u = np.stack([u, u, u])
    frames_v = np.stack([v, v, v])
    tv = prepare_time_varying(
        frames_u, frames_v, lat, lon, bg_t0=0.0, bg_dt=2 * DAY,
        cal_dtype="float64",
    )
    cfg = RunConfig(integrator=integrator, **CFG)
    a = rt.trace_rays(static, cfg)
    b = rt.trace_rays(tv, cfg)
    # rk45: the time-varying sampler's different fusion perturbs the adaptive
    # controller at ulp level, which accumulates slightly along trajectories.
    atol = 1e-10 if integrator == "rk4" else 1e-6
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, k)), np.asarray(getattr(b, k)),
            rtol=0, atol=atol, equal_nan=True, err_msg=k,
        )


def test_time_interpolation_midpoint(jet_field):
    """Sampling halfway between two frames equals the average background
    (linearity of the whole precompute in u, v)."""
    import jax.numpy as jnp
    from rwrt_tpu.models.ray import sample_bg
    from rwrt_tpu import tracer

    u, v, lat, lon = jet_field
    # float64 ingestion: the linearity identity requires exact frame values
    # (f32 rounding is nonlinear and FD stencils amplify it).
    tv = prepare_time_varying(
        np.stack([u, 3.0 * u]), np.stack([v, 3.0 * v]), lat, lon,
        bg_t0=0.0, bg_dt=1 * DAY, read_dtype="float64", cal_dtype="float64",
    )
    mid = rt.prepare(2.0 * u, 2.0 * v, lat, lon, read_dtype="float64",
                     cal_dtype="float64")

    bg_tv = tracer.make_background(tv, 0.0)
    bg_mid = tracer.make_background(mid, 0.0)
    pts_lon = jnp.asarray(np.radians([10.0, 100.0, 250.0]))
    pts_lat = jnp.asarray(np.radians([-30.0, 20.0, 55.0]))
    a = np.asarray(sample_bg(bg_tv, pts_lon, pts_lat, 0.5 * DAY))
    b = np.asarray(sample_bg(bg_mid, pts_lon, pts_lat, 0.0))
    scale = np.nanmax(np.abs(b), axis=1, keepdims=True) + 1e-30
    np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=1e-9)

    # Clamped before frame 0 and after the last frame.
    lo = np.asarray(sample_bg(bg_tv, pts_lon, pts_lat, -5 * DAY))
    f0 = np.asarray(sample_bg(tracer.make_background(
        rt.prepare(u, v, lat, lon, read_dtype="float64",
                   cal_dtype="float64"), 0.0),
        pts_lon, pts_lat, 0.0))
    np.testing.assert_allclose(lo / scale, f0 / scale, rtol=0, atol=1e-9)


def test_varying_background_changes_trajectories(jet_field):
    """Rays must actually feel the time variation."""
    u, v, lat, lon = jet_field
    tv = prepare_time_varying(
        np.stack([u, 1.5 * u]), np.stack([v, v]), lat, lon,
        bg_t0=0.0, bg_dt=2 * DAY, cal_dtype="float64",
    )
    static = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    cfg = RunConfig(integrator="rk4", **CFG)
    a = rt.trace_rays(static, cfg)
    b = rt.trace_rays(tv, cfg)
    la, lb = np.asarray(a.lat), np.asarray(b.lat)
    both = np.isfinite(la) & np.isfinite(lb)
    assert np.nanmax(np.abs(la[both] - lb[both])) > 1e-3


def test_ensemble_vmap(jet_field):
    """Ensemble sweep over multiple backgrounds (BASELINE config 5): one more
    vmapped axis over stacked field tensors gives the same results as
    separate runs."""
    import jax
    import jax.numpy as jnp
    from rwrt_tpu import tracer
    from rwrt_tpu.tracer import initialize, make_background

    u, v, lat, lon = jet_field
    members = [rt.prepare(s * u, v, lat, lon, cal_dtype="float64")
               for s in (0.8, 1.0, 1.2)]
    cfg = RunConfig(integrator="rk4", **CFG)

    # Separate runs.
    sep = [rt.trace_rays(m, cfg) for m in members]

    # Ensemble: vmap the fused rk4 runner over stacked backgrounds.
    bgs = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[make_background(m, 0.0) for m in members]
    )
    slon, slat = tracer.source_matrix(
        cfg.sw_lon, cfg.sw_lat, cfg.dlon, cfg.dlat, cfg.nnx, cfg.nny
    )
    slon = jnp.asarray(slon)
    slat = jnp.asarray(slat)
    zwn = jnp.asarray(cfg.zwn_array())

    def run_one(bg):
        y0, ug0, vg0 = initialize(bg, slon, slat, zwn)
        dt = jnp.asarray(cfg.tstep, y0.dtype)
        return tracer._run_rk4(
            bg, y0, ug0, vg0, dt, cfg.nt, jnp.asarray(cfg.cut_off_rad, y0.dtype)
        )

    ys, ugs, vgs = jax.vmap(run_one)(bgs)
    for i, t in enumerate(sep):
        np.testing.assert_allclose(
            np.asarray(ys[i][:, 0]).reshape(np.asarray(t.lon).shape),
            np.asarray(t.lon), rtol=0, atol=1e-11, equal_nan=True,
        )
