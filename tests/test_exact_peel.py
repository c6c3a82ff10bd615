"""Exact-mode peel scheduling (tracer._rk45_group_chunk_peeled).

The grouped exact chunk's while-loop trip count is the max over lanes, so a
single late-run straggler pinned near the step floor makes the entire batch
pay thousands of trips. Peel scheduling suspends at an iteration cap,
compacts the actually-unfinished lanes to a narrow sub-batch, and resumes --
bitwise equal to the uninterrupted chunk because every per-lane controller
quantity (t, h, FSAL carry, rejected/new_step flags, bound index, history,
prev saved position) is lane-independent and travels with the lane through
the suspend/gather/resume (solvers/rk45.py integrate_group state0).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import rwrt_tpu as rt
from rwrt_tpu import tracer
from rwrt_tpu.config import RunConfig
from rwrt_tpu.models import ray as ray_mod
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


def test_exact_peel_bitwise_equals_group_chunk(bs):
    """Tiny caps force every peel mechanism (full-width suspend, subset
    compaction at several widths, uncapped tail) across multiple chunks;
    history, (ug, vg), lane attempts, and the full carry must match the
    uninterrupted exact chunk bitwise at every chunk boundary."""
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

    cp = cu = (y0, t0, h0, f0, y0[0], y0[1])
    nt, chunk = 49, 16
    step = 1
    while step < nt:
        n = min(chunk, nt - step)
        bounds = jnp.arange(step, step + n, dtype=jnp.float64) * dt
        cu, (hu, uu, vu, _, _, lau) = tracer._rk45_group_chunk(
            bg, *cu, bounds, cut_off, rtol, atol, min_step)
        cp, (hp, up, vp, units, _, lap) = tracer._rk45_group_chunk_peeled(
            bg, *cp, bounds, cut_off, rtol, atol, min_step,
            caps=(6, 18), min_width=32)
        for a, b, name in [(hu, hp, "hist"), (uu, up, "ug"), (vu, vp, "vg"),
                           (lau, lap, "lane_att")]:
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype.kind == "f":
                same = (a == b) | (np.isnan(a) & np.isnan(b))
            else:
                same = a == b
            assert same.all(), (name, step)
        for a, b in zip(cu, cp):
            a, b = np.asarray(a), np.asarray(b)
            same = (a == b) | (np.isnan(a) & np.isnan(b))
            assert same.all(), ("carry", step)
        step += n


def test_exact_peel_through_chunked_driver(bs):
    """The chunked driver's exact default routes through the peeled
    scheduler (config.peel, on by default); it must match the unpeeled
    exact driver bitwise."""
    peeled = trace_rays_chunked(bs, RunConfig(peel=True, **CFG),
                                chunk_steps=16, verbose=False)
    plain = trace_rays_chunked(bs, RunConfig(peel=False, **CFG),
                               chunk_steps=16, verbose=False)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(peeled, k)), np.asarray(getattr(plain, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k,
        )


def test_peel_caps_exact_config_knob(bs):
    """RunConfig.peel_caps_exact reaches the exact-mode peel scheduler (the
    dense-only cap asymmetry closed in round 3): tiny explicit caps force
    the full suspend/compact/resume machinery through the chunked driver
    and must stay bitwise-equal to the derived-caps default."""
    tuned = trace_rays_chunked(
        bs, RunConfig(peel_caps_exact=(2, 8), **CFG),
        chunk_steps=16, verbose=False)
    default = trace_rays_chunked(bs, RunConfig(**CFG),
                                 chunk_steps=16, verbose=False)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(tuned, k)), np.asarray(getattr(default, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k,
        )


def test_peel_caps_validation():
    """Non-increasing or non-positive caps are rejected loudly."""
    with pytest.raises(ValueError, match="peel_caps_exact"):
        RunConfig(peel_caps_exact=(8, 2), **CFG).validate()
    with pytest.raises(ValueError, match="peel_caps"):
        RunConfig(peel_caps=(0, 4), **CFG).validate()


def test_exact_peel_equals_fused(bs):
    """Driver-level: the peeled chunked result equals the fused grouped
    runner (which is itself golden-tested) bitwise when the chunk split
    matches interval_batch."""
    cfg = RunConfig(interval_batch=12, **CFG)
    fused = tracer.trace_rays(bs, cfg)
    chunked = trace_rays_chunked(bs, cfg, chunk_steps=12, verbose=False)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(fused, k)), np.asarray(getattr(chunked, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k,
        )


def test_exact_peel_cap_ceiling_bounds_every_leg(bs):
    """cap_ceiling must clamp the LISTED caps too, not just the escalation
    legs: a ceiling below caps[0] still yields bitwise-equal results, just
    through more (smaller) leg programs. Guards the bounded-program
    invariant the remote-worker watchdog relies on."""
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
    bounds = jnp.arange(1, 17, dtype=jnp.float64) * dt

    carry = (y0, t0, h0, f0, y0[0], y0[1])
    _, (hu, uu, vu, _, _, _) = tracer._rk45_group_chunk(
        bg, *carry, bounds, cut_off, rtol, atol, min_step)
    # caps=(64, 256) but ceiling=8: every leg (including leg 0) runs at
    # most 8 trips per program.
    _, (hp, up, vp, _, _, _) = tracer._rk45_group_chunk_peeled(
        bg, *carry, bounds, cut_off, rtol, atol, min_step,
        caps=(64, 256), min_width=32, cap_ceiling=8)
    for a, b, name in [(hu, hp, "hist"), (uu, up, "ug"), (vu, vp, "vg")]:
        a, b = np.asarray(a), np.asarray(b)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), name
