"""Mixed precision (RunConfig.state_dtype='float64'): f32 background sample
and RHS algebra, f64 state accumulation and controller (DESIGN.md section
7). The default ('compute') path is exercised bitwise by the whole rest of
the suite; here we pin the accuracy win and the plumbing."""

import dataclasses

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig

DAY = 86400.0


@pytest.fixture(scope="module")
def sheared_jet():
    nlon, nlat = 96, 49
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    u = (25 * np.cos(lat)[None, :] ** 2
         + 30 * np.exp(-(((np.degrees(lat)[None, :] - 35) / 12.0) ** 2))
         + 6 * np.cos(3 * lon)[:, None] * np.cos(lat)[None, :] ** 2)
    v = 4 * np.sin(2 * lon)[:, None] * np.cos(lat)[None, :]
    return u, v, lat, lon


CFG = dict(zwn=(3.0, 5.0), sw_lon=0.0, sw_lat=15.0, dlon=60.0, dlat=10.0,
           nnx=3, nny=2, tstep=7200.0, ttotal=10 * DAY)


def _drift(a, ref):
    d = np.abs(np.degrees(np.asarray(a.lat, np.float64)
                          - np.asarray(ref.lat)))
    return np.sqrt(np.nanmean(np.where(np.isfinite(d), d, 0.0) ** 2))


@pytest.mark.parametrize("integrator", ["rk45", "rk4"])
def test_mixed_precision_reduces_f32_drift(sheared_jet, integrator):
    """f64 state over an f32 background at least halves the adaptive path's
    10-day drift vs pure f32 (measured ~4x for rk45 on this jet: thousands
    of accepted micro-steps each round the state), and the output carries
    the wide dtype. Fixed-step rk4 takes only ~120 steps, so its drift is
    dominated by the (deliberately f32) RHS algebra -- there the claim is
    just no-regression."""
    u, v, lat, lon = sheared_jet
    cfg64 = RunConfig(integrator=integrator, cal_dtype="float64", **CFG)
    ref = rt.trace_rays(rt.prepare(u, v, lat, lon, cal_dtype="float64"),
                        cfg64)
    bs32 = rt.prepare(u, v, lat, lon, cal_dtype="float32")
    cfg32 = dataclasses.replace(cfg64, cal_dtype="float32")
    pure = rt.trace_rays(bs32, cfg32)
    mixed = rt.trace_rays(
        bs32, dataclasses.replace(cfg32, state_dtype="float64"))
    assert np.asarray(mixed.lat).dtype == np.float64
    d_pure, d_mixed = _drift(pure, ref), _drift(mixed, ref)
    if integrator == "rk45":
        assert d_mixed < 0.5 * d_pure, (d_pure, d_mixed)
    else:
        assert d_mixed <= d_pure * 1.05, (d_pure, d_mixed)
    # Sanity: both are small in absolute terms at 10 days.
    assert d_pure < 0.1 and d_mixed < 0.05


def test_state_dtype_validation():
    with pytest.raises(ValueError, match="state_dtype"):
        RunConfig(zwn=(3.0,), sw_lon=0.0, sw_lat=10.0, dlon=1.0, dlat=1.0,
                  nnx=1, nny=1, tstep=7200.0, ttotal=DAY,
                  state_dtype="float128").validate()


def test_mixed_precision_chunked_equals_fused(sheared_jet, tmp_path):
    """The chunked/checkpointed driver carries the wide state identically
    to the fused runner (including across a checkpoint resume)."""
    from rwrt_tpu.utils.checkpoint import trace_rays_chunked

    u, v, lat, lon = sheared_jet
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float32")
    cfg = RunConfig(integrator="rk45", cal_dtype="float32",
                    state_dtype="float64",
                    **{**CFG, "ttotal": 4 * DAY})
    fused = rt.trace_rays(bs, cfg)
    chunked = trace_rays_chunked(bs, cfg, chunk_steps=13, verbose=False)
    for k in ("lon", "lat", "kx", "ky", "amp"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fused, k)), np.asarray(getattr(chunked, k)),
            err_msg=k)
    # resume mid-run equals uninterrupted
    ck = str(tmp_path / "ck.npz")
    partial = dataclasses.replace(cfg, ttotal=2 * DAY)
    trace_rays_chunked(bs, partial, chunk_steps=8, verbose=False,
                       checkpoint_path=ck)
    resumed = trace_rays_chunked(bs, cfg, chunk_steps=8, verbose=False,
                                 checkpoint_path=ck)
    full = trace_rays_chunked(bs, cfg, chunk_steps=8, verbose=False)
    for k in ("lon", "lat", "ky"):
        np.testing.assert_array_equal(
            np.asarray(getattr(resumed, k)), np.asarray(getattr(full, k)),
            err_msg=k)
