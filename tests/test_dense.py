"""Dense-output bound mode (RunConfig.bound_mode='dense').

The exact mode clamps every adaptive step at every output bound (reference
wr.py:808-830); dense mode steps freely and evaluates output states from the
Dormand-Prince quartic dense-output interpolant (scipy's solve_ivp(t_eval=...)
treatment). NOT bit-identical to the exact path by design; these tests pin

- the interpolant constants (theta=1 must reproduce the 5th-order solution),
- tolerance-level agreement and IDENTICAL NaN kill masks vs the exact path,
- bitwise equality of the bucketed-dense scheduler against plain dense,
- driver-level equivalence (chunked vs fused) and time-varying backgrounds.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig
from rwrt_tpu import tracer
from rwrt_tpu.models import ray as ray_mod
from rwrt_tpu.solvers import rk45 as rk45_mod
from rwrt_tpu.utils.checkpoint import trace_rays_chunked

HOUR, DAY = 3600.0, 86400.0

CFG = dict(
    zwn=(2.0, 4.0, 6.0), sw_lon=0.0, sw_lat=5.0, dlon=36.0, dlat=8.0,
    nnx=5, nny=4, tstep=2 * HOUR, ttotal=6 * DAY, cal_dtype="float64",
    integrator="rk45",
)


@pytest.fixture(scope="module")
def bs(jet_field):
    u, v, lat, lon = jet_field
    return rt.prepare(u, v, lat, lon, cal_dtype="float64")


def test_interpolant_consistent_with_tableau():
    """At theta=1 the dense interpolant must equal the 5th-order step:
    sum_j DP_P[i][j] == DP_B[i] (and 0 for the FSAL row)."""
    for i, row in enumerate(rk45_mod.DP_P):
        b = rk45_mod.DP_B[i] if i < 6 else 0.0
        assert abs(sum(row) - b) < 1e-12, i


def test_dense_matches_exact_at_tolerance(bs):
    """Dense trajectories agree with the (golden-tested) exact path at
    tolerance level, with IDENTICAL NaN masks, and cost fewer iterations."""
    exact = tracer.trace_rays(bs, RunConfig(**CFG))
    dense = tracer.trace_rays(bs, RunConfig(bound_mode="dense", **CFG))
    for k in ("lon", "lat"):
        a = np.asarray(getattr(exact, k))
        b = np.asarray(getattr(dense, k))
        assert ((np.isnan(a) == np.isnan(b)).all()), f"{k}: NaN masks differ"
        ok = ~np.isnan(a)
        rmse = np.sqrt(np.mean((a[ok] - b[ok]) ** 2))
        # requested tolerance is rtol=1e-6; 6 days of accumulation lands
        # ~1e-4 rad; the acceptance gate for the physics is 0.1 deg.
        assert np.degrees(rmse) < 0.02, f"{k}: RMSE {np.degrees(rmse)} deg"


def test_dense_kill_masks_exact(bs):
    """A tiny cut_off kills every ray at its first output bound in both
    modes -- the post-pass cascade must reproduce the exact path's masks."""
    cfg = dict(CFG)
    cfg["ttotal"] = 2 * DAY
    exact = tracer.trace_rays(bs, RunConfig(cut_off=1e-7, **cfg))
    dense = tracer.trace_rays(
        bs, RunConfig(cut_off=1e-7, bound_mode="dense", **cfg))
    for k in ("lon", "lat", "amp"):
        a, b = np.asarray(getattr(exact, k)), np.asarray(getattr(dense, k))
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b), err_msg=k)


def test_bucketed_dense_bitwise_equals_dense(bs):
    """The difficulty-bucketed scheduler under dense mode is a pure lane
    permutation -> bitwise identical to plain dense."""
    cfg = RunConfig(bound_mode="dense", **CFG)
    plain = trace_rays_chunked(bs, cfg, chunk_steps=12, verbose=False)
    cfg_b = RunConfig(bound_mode="dense", difficulty_buckets=4, **CFG)
    bucketed = trace_rays_chunked(bs, cfg_b, chunk_steps=12, verbose=False)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(plain, k)), np.asarray(getattr(bucketed, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k,
        )


def test_chunked_dense_equals_fused_dense(bs):
    """Dense results depend only on the clamp (group) boundaries; with the
    chunk split equal to interval_batch the chunked driver must reproduce
    the fused grouped runner bitwise."""
    cfg = RunConfig(bound_mode="dense", interval_batch=12, **CFG)
    fused = tracer.trace_rays(bs, cfg)
    chunked = trace_rays_chunked(bs, cfg, chunk_steps=12, verbose=False)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(fused, k)), np.asarray(getattr(chunked, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k,
        )


def test_dense_frozen_rootless_lanes(bs):
    """Rootless lanes keep their seed state at every bound (the adaptive
    freeze semantics, reference rkf45.py:400-403) in dense mode too."""
    res = tracer.trace_rays(bs, RunConfig(bound_mode="dense", **CFG))
    amp0 = np.asarray(res.amp[0])
    frozen = np.isnan(amp0)
    assert frozen.any(), "fixture should produce some rootless lanes"
    lon = np.asarray(res.lon)
    lat = np.asarray(res.lat)
    assert (lon[:, frozen] == lon[0, frozen][None]).all()
    assert (lat[:, frozen] == lat[0, frozen][None]).all()
    assert np.isnan(np.asarray(res.ky)[1:, frozen]).all() or (
        np.isnan(np.asarray(res.ky)[0, frozen]).all())


def test_dense_sharded_equals_single(bs):
    """Dense mode through the shard_map path (8-device virtual mesh) agrees
    with the single-device dense run (NaN masks exact; ULP codegen wobble
    within the usual bound)."""
    from rwrt_tpu.parallel import sharding as sh

    cfg = RunConfig(bound_mode="dense", **CFG)
    single = tracer.trace_rays(bs, cfg)
    mesh = sh.make_mesh(8)
    sharded = tracer.trace_rays(bs, cfg, mesh=mesh)
    for k in ("lon", "lat"):
        a, b = np.asarray(getattr(single, k)), np.asarray(getattr(sharded, k))
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b), err_msg=k)
        ok = ~np.isnan(a)
        assert np.max(np.abs(a[ok] - b[ok])) < 1e-6, k


def test_dense_time_varying(jet_field):
    """Dense mode samples the background at the correct model time: a
    time-varying stack must agree with the exact path at tolerance level."""
    from rwrt_tpu.models.basic_state import prepare_time_varying

    u, v, lat, lon = jet_field
    u2 = np.stack([u, u * 1.3])
    v2 = np.stack([v, v * 0.7])
    bs_tv = prepare_time_varying(u2, v2, lat, lon, bg_dt=6 * DAY,
                                 cal_dtype="float64")
    cfg = dict(CFG)
    cfg["ttotal"] = 4 * DAY
    exact = tracer.trace_rays(bs_tv, RunConfig(**cfg))
    dense = tracer.trace_rays(bs_tv, RunConfig(bound_mode="dense", **cfg))
    a, b = np.asarray(exact.lon), np.asarray(dense.lon)
    assert (np.isnan(a) == np.isnan(b)).all()
    ok = ~np.isnan(a)
    rmse = np.sqrt(np.mean((a[ok] - b[ok]) ** 2))
    assert np.degrees(rmse) < 0.02


def test_dense_bucketed_chunked_mesh_equals_single(bs):
    """The chunked driver with a mesh + dense + buckets (everything on) must
    agree with the single-device dense+bucketed run: shard-local argsort and
    kill cascade, zero cross-shard coupling."""
    from rwrt_tpu.parallel import sharding as sh

    cfg = RunConfig(bound_mode="dense", difficulty_buckets=2,
                    interval_batch=12, **CFG)
    single = trace_rays_chunked(bs, cfg, chunk_steps=12, verbose=False)
    mesh = sh.make_mesh(4)
    sharded = trace_rays_chunked(bs, cfg, chunk_steps=12, verbose=False,
                                 mesh=mesh)
    for k in ("lon", "lat"):
        a = np.asarray(getattr(single, k))
        b = np.asarray(getattr(sharded, k))
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b), err_msg=k)
        ok = ~np.isnan(a)
        assert np.max(np.abs(a[ok] - b[ok])) < 1e-6, k


def test_peel_bitwise_equals_dense_chunk(bs):
    """Peel scheduling (suspend at a cap, compact the actually-unfinished
    lanes, resume narrow) must reproduce the uninterrupted dense chunk
    bitwise -- every per-lane quantity is independent and the controller
    flags travel with the lane."""
    import jax.numpy as jnp
    from rwrt_tpu.models import ray as ray_mod

    bg = tracer.make_background(bs, 0.0)
    slon, slat = tracer.source_matrix(0.0, 5.0, 36.0, 8.0, 5, 4)
    zwn = jnp.asarray([2.0, 4.0, 6.0])
    y0, _, _ = tracer.initialize(bg, jnp.asarray(slon), jnp.asarray(slat),
                                 zwn)
    r = y0.shape[1]
    dt = 7200.0
    rtol = jnp.asarray(1e-6)
    atol = jnp.asarray(1e-6)
    min_step = jnp.asarray(7.2)
    cut_off = jnp.asarray(0.2)
    h0 = tracer.initial_step_sizes(bg, y0, rtol, atol)
    t0 = jnp.zeros(r, jnp.float64)
    f0, _ = ray_mod.rhs(bg, y0)

    cd = (y0, t0, h0, f0, y0[0], y0[1])
    cp = cd
    nt, chunk = 49, 16
    step = 1
    while step < nt:
        n = min(chunk, nt - step)
        bounds = jnp.arange(step, step + n, dtype=jnp.float64) * dt
        cd, (hd, ud, vd, _, _, lad) = tracer._rk45_group_chunk_dense(
            bg, *cd, bounds, cut_off, rtol, atol, min_step)
        cp, (hp, up, vp, units, _, lap) = (
            tracer._rk45_group_chunk_dense_peeled(
                bg, *cp, bounds, cut_off, rtol, atol, min_step,
                caps=(6, 18), min_width=32))
        for a, b, name in [(hd, hp, "hist"), (ud, up, "ug"), (vd, vp, "vg"),
                           (lad, lap, "lane_att")]:
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype.kind == "f":
                same = (a == b) | (np.isnan(a) & np.isnan(b))
            else:
                same = a == b
            assert same.all(), (name, step)
        for a, b in zip(cd, cp):
            a, b = np.asarray(a), np.asarray(b)
            same = (a == b) | (np.isnan(a) & np.isnan(b))
            assert same.all(), ("carry", step)
        step += n


def test_peel_through_chunked_driver(bs):
    """The chunked driver's dense default is the peeled scheduler; it must
    match the unpeeled dense driver bitwise."""
    cfg_p = RunConfig(bound_mode="dense", peel=True, peel_caps=(6, 18),
                      **CFG)
    cfg_u = RunConfig(bound_mode="dense", peel=False, **CFG)
    peeled = trace_rays_chunked(bs, cfg_p, chunk_steps=16, verbose=False)
    plain = trace_rays_chunked(bs, cfg_u, chunk_steps=16, verbose=False)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(peeled, k)), np.asarray(getattr(plain, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k,
        )
