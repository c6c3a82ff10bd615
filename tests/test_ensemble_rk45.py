"""Adaptive (rk45) ensemble sweeps: members flattened into the lane axis
(BASELINE.json config 5; VERDICT r1 item 4). Per-member results must match
separate runs."""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig

HOUR, DAY = 3600.0, 86400.0

CFG = dict(
    zwn=(2.0, 4.0), sw_lon=0.0, sw_lat=10.0, dlon=90.0, dlat=10.0,
    nnx=2, nny=2, tstep=2 * HOUR, ttotal=3 * DAY, cal_dtype="float64",
)


@pytest.fixture(scope="module")
def members(jet_field):
    u, v, lat, lon = jet_field
    return [rt.prepare(s * u, v, lat, lon, cal_dtype="float64")
            for s in (0.8, 1.0, 1.2)]


@pytest.mark.parametrize("interval_batch", [1, 16])
def test_ensemble_rk45_matches_separate_runs(members, interval_batch):
    """Flattened-lane ensemble vs separate per-member runs. The member-offset
    gather is bit-identical per member; the only allowed deviation is XLA
    codegen ULP wobble from the larger flattened lane count (same bound as
    the shard_map tests). NaN masks must match exactly."""
    from rwrt_tpu.tracer import trace_rays_ensemble

    cfg = RunConfig(integrator="rk45", interval_batch=interval_batch, **CFG)
    ens = trace_rays_ensemble(members, cfg)
    assert len(ens) == 3
    for m, traj in zip(members, ens):
        sep = rt.trace_rays(m, cfg)
        for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
            x = np.asarray(getattr(sep, k))
            y = np.asarray(getattr(traj, k))
            np.testing.assert_array_equal(np.isnan(x), np.isnan(y),
                                          err_msg=k)
            np.testing.assert_allclose(x, y, rtol=0, atol=1e-6,
                                       equal_nan=True, err_msg=k)


def test_ensemble_rk45_sharded(members):
    """Multi-chip ensembles: flattened lanes + member ids shard over the
    'rays' axis; results match the single-device ensemble (NaN masks exact,
    values within codegen ULP wobble)."""
    from rwrt_tpu.parallel import sharding as sh
    from rwrt_tpu.tracer import trace_rays_ensemble

    cfg = RunConfig(integrator="rk45", **CFG)
    single = trace_rays_ensemble(members, cfg)
    sharded = trace_rays_ensemble(members, cfg, mesh=sh.make_mesh(8))
    for a, b in zip(single, sharded):
        for k in ("lon", "lat", "ky", "amp", "ug", "vg"):
            x = np.asarray(getattr(a, k))
            y = np.asarray(getattr(b, k))
            np.testing.assert_array_equal(np.isnan(x), np.isnan(y),
                                          err_msg=k)
            np.testing.assert_allclose(x, y, rtol=0, atol=1e-6,
                                       equal_nan=True, err_msg=k)


@pytest.mark.parametrize("interval_batch", [1, 16])
def test_time_varying_ensemble_rk45(jet_field, interval_batch):
    """Time-varying members through the adaptive flattened-lane path (the
    round-1 NotImplementedError): per-member results must match separate
    time-varying trace_rays runs (member+time offsets fold into one gather,
    interp.sample_raw_packed_member_time)."""
    from rwrt_tpu.models.basic_state import prepare_time_varying
    from rwrt_tpu.tracer import trace_rays_ensemble

    u, v, lat, lon = jet_field
    DAY_ = 86400.0
    tv_members = [
        prepare_time_varying(
            np.stack([s * u, 1.3 * s * u]), np.stack([v, 0.5 * v]),
            lat, lon, bg_t0=0.0, bg_dt=2 * DAY_, cal_dtype="float64",
        )
        for s in (0.9, 1.1)
    ]
    cfg = RunConfig(integrator="rk45", interval_batch=interval_batch, **CFG)
    ens = trace_rays_ensemble(tv_members, cfg)
    assert len(ens) == 2
    for m, traj in zip(tv_members, ens):
        sep = rt.trace_rays(m, cfg)
        for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
            x = np.asarray(getattr(sep, k))
            y = np.asarray(getattr(traj, k))
            np.testing.assert_array_equal(np.isnan(x), np.isnan(y),
                                          err_msg=k)
            np.testing.assert_allclose(x, y, rtol=0, atol=1e-6,
                                       equal_nan=True, err_msg=k)


def test_time_varying_ensemble_rejects_mismatched_time_metadata(jet_field):
    from rwrt_tpu.models.basic_state import prepare_time_varying
    from rwrt_tpu.tracer import trace_rays_ensemble

    u, v, lat, lon = jet_field
    DAY_ = 86400.0
    a = prepare_time_varying(np.stack([u, u]), np.stack([v, v]), lat, lon,
                             bg_t0=0.0, bg_dt=1 * DAY_, cal_dtype="float64")
    b = prepare_time_varying(np.stack([u, u]), np.stack([v, v]), lat, lon,
                             bg_t0=0.0, bg_dt=2 * DAY_, cal_dtype="float64")
    cfg = RunConfig(integrator="rk45", **CFG)
    with pytest.raises(ValueError, match="time metadata"):
        trace_rays_ensemble([a, b], cfg)


def test_ensemble_members_actually_differ(members):
    from rwrt_tpu.tracer import trace_rays_ensemble

    cfg = RunConfig(integrator="rk45", **CFG)
    ens = trace_rays_ensemble(members, cfg)
    a = np.asarray(ens[0].lat)
    b = np.asarray(ens[2].lat)
    both = np.isfinite(a) & np.isfinite(b)
    assert np.abs(a[both] - b[both]).max() > 1e-3
