"""Straggler pin-kill (RunConfig.pin_limit / pin_mwn).

A lane grinding toward a critical layer takes thousands of error-controlled
near-floor steps before the |l| >= 100 cap (reference wr.py:509) retires
it; pin_limit retires it from the grind's PRECURSOR (per-chunk step-attempt
count lane_att >= pin_limit while |l| >= pin_mwn) through the ordinary
NaN death path. These tests gate the contract:

- OFF (default) and unreachable thresholds are bitwise no-ops;
- retirement fires exactly on the documented condition, emitted samples
  before the retirement bound are bitwise-untouched, later bounds are NaN
  (the ordinary mid-chunk death pattern);
- the attempt counter's retirement fires identically through the peel
  scheduler's suspend/gather/resume (peeled == unpeeled, bitwise, pin ON);
- config validation rejects the knob outside dense mode and bad values.

The "retired lanes would have died under the |m| cap anyway" claim is
physics, gated on the real workload by the device probe
(benchmarks/straggler_probe.py) rather than unit tests.
"""

import numpy as np
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
    integrator="rk45", bound_mode="dense",
)


@pytest.fixture(scope="module")
def bs(jet_field):
    u, v, lat, lon = jet_field
    return rt.prepare(u, v, lat, lon, cal_dtype="float64")


# ---------------------------------------------------------------------------
# Synthetic stiff ODE: exact control over which lanes pin and when |y[3]|
# crosses the threshold, without waiting for real critical-layer physics.
# ---------------------------------------------------------------------------

OSC = 1.0e4  # forcing frequency: demands h ~ 1e-4, far below easy lanes'


def _osc_rhs(hard, grow):
    """Per-lane rhs with persistent accuracy-limited step demand: row1
    tracks a fast oscillation (per-lane flag `hard`; the error controller
    wants h ~ 1/OSC FOREVER -- the straggler grind, unlike stiff decay
    which self-relaxes), so `hard` lanes rack up step attempts ~40x faster
    than easy ones; row3 (the |l| slot) grows at per-lane rate `grow` so
    it crosses pin_mwn at a known time; rows 0/2/4 advance at unit rate
    as progress markers."""

    def rhs(y, t=0.0):
        one = jnp.ones_like(y[0])
        return jnp.stack([
            one,
            hard * OSC * jnp.cos(OSC * t) + (1.0 - hard),
            one,
            grow * one,
            one,
        ])

    return rhs


def _run_dense(rhs, y0, bounds, min_step, **pin):
    r = y0.shape[1]
    t0 = jnp.zeros(r, y0.dtype)
    h0 = jnp.full(r, 1e-2, y0.dtype)
    f0 = rhs(y0, t0)
    return rk45_mod.integrate_group_dense(
        rhs, y0, t0, h0, f0, bounds, jnp.asarray(1e-6), jnp.asarray(1e-8),
        jnp.asarray(min_step), **pin)


# Lane design (R=8): 0,1 easy; 2,3 grinding with |l| crossing pin_mwn
# (=50) at t = (50-30)/400 = 0.05 -> retired mid-run (attempts are far
# past pin_limit by then); 4,5 grinding but |l| pinned near 0 -> spared by
# the |l| gate; 6,7 easy with |l| >= 50 from the start -> spared by the
# attempts gate.
HARD = jnp.asarray([0., 0., 1., 1., 1., 1., 0., 0.])
GROW = jnp.asarray([0., 0., 400., -400., 0., 0., 0., 0.])
Y3_0 = jnp.asarray([0., 0., 30., -30., 0., 0., 60., -60.])
BOUNDS = jnp.asarray([0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07],
                     jnp.float64)


def test_pin_retires_only_grinding_large_l_lanes():
    """Three lane classes: easy (few attempts), grinding with small |l|
    (attempt budget blown but below pin_mwn -> NOT retired), grinding with
    growing |l| (retired once the budget AND threshold are both met). Easy
    and non-retired lanes must be bitwise identical to the pin-off run."""
    y0 = jnp.zeros((5, 8), jnp.float64).at[3].set(Y3_0)
    rhs = _osc_rhs(HARD, GROW)

    base = _run_dense(rhs, y0, BOUNDS, 1e-3)
    pin = _run_dense(rhs, y0, BOUNDS, 1e-3,
                     pin_limit=jnp.asarray(200, jnp.int32),
                     pin_mwn=jnp.asarray(50.0))

    hist_b, hist_p = np.asarray(base[0]), np.asarray(pin[0])
    la = np.asarray(pin[7])

    # Baseline: nobody dies (the forcing is bounded; just slow to resolve).
    assert np.isfinite(hist_b).all()
    # Easy lanes and small-|l| grinding lanes: bitwise identical.
    for lane in (0, 1, 4, 5, 6, 7):
        np.testing.assert_array_equal(hist_b[..., lane], hist_p[..., lane],
                                      err_msg=f"lane {lane}")
    # Large-|l| grinding lanes: retired (NaN at the later bounds)...
    for lane in (2, 3):
        dead = np.isnan(hist_p[:, 0, lane])
        assert dead.any(), f"lane {lane} not retired"
        # ...mid-run (|l| crosses 50 at t=0.05), not at entry.
        assert not dead[:4].any(), f"lane {lane} retired too early"
        # ...and every bound emitted before retirement is bitwise intact.
        np.testing.assert_array_equal(
            hist_b[~dead, :, lane], hist_p[~dead, :, lane],
            err_msg=f"lane {lane} pre-retirement samples")
        # NaN is suffix-shaped: once dead, dead at every later bound.
        assert (np.diff(dead.astype(int)) >= 0).all(), lane
    # The small-|l| grinding lanes really blew the attempt budget,
    # proving the |l| gate (not luck) is what spared them.
    assert la[4] >= 200 and la[5] >= 200, la
    # Easy lanes stayed far under the budget.
    assert la[0] < 200 and la[7] < 200, la


def test_pin_kills_perpetual_rejection_grinder():
    """Round-5 predicate extension (VERDICT r4 item 2): a lane whose every
    trial is REJECTED (error >= 1 as h collapses) never produces an
    accepted step, so the round-4 accept-only gate could not retire it --
    measured at scale: one 8-shard chunk ground 1,001,209 loop trips /
    2.14 M attempts on one shard with pin500/m0 armed
    (benchmarks/r4_results/multichip_skew_pin500m0.json). The extended
    predicate fires on rejected attempts at/below the step floor too.

    Grinder construction: a forcing term BIG*sin(W*t) with W=1e24 is
    noise at every step size the controller can reach before f64
    exhaustion, so the embedded error estimate stays >> 1 while h decays
    0.2x per rejection -- a deterministic perpetual-rejection lane (the
    unpinned control below measures it: ~zero progress at a 2000-trip
    cap)."""
    W, BIG = 1e24, 1e10
    hard = jnp.asarray([0., 0., 1., 0.])  # lane 2 grinds

    def rhs(y, t=0.0):
        one = jnp.ones_like(y[0])
        noise = BIG * jnp.sin(W * t) * one
        return jnp.stack([one, hard * noise + (1.0 - hard), one,
                          jnp.zeros_like(one), one])

    y0 = jnp.zeros((5, 4), jnp.float64)
    bounds = jnp.asarray([0.01, 0.02, 0.03], jnp.float64)
    t0 = jnp.zeros(4, jnp.float64)
    h0 = jnp.full(4, 1e-2, jnp.float64)
    f0 = rhs(y0, t0)
    args = (rhs, y0, t0, h0, f0, bounds, jnp.asarray(1e-6),
            jnp.asarray(1e-8), jnp.asarray(1e-3))

    # Unpinned control: the grinder is real -- it eats the whole 2000-trip
    # budget having advanced ~nothing (perpetual rejection, no accepts:
    # la == trips), and the batch never finishes.
    off = rk45_mod.integrate_group_dense(*args, max_iters=2000)
    assert int(off[5]) == 2000
    assert float(off[2][2]) < 1e-10  # t: no progress
    assert int(off[7][2]) == 2000   # every trip was this lane's attempt

    # Armed attempts-only (the production gate, pin_mwn=0): retired at
    # EXACTLY lane_att == pin_limit. Since the lane never accepted a step,
    # the retirement necessarily fired on a REJECTED attempt -- the
    # round-4 predicate (upd & ...) could not have fired here at all.
    pin = rk45_mod.integrate_group_dense(
        *args, max_iters=2000,
        pin_limit=jnp.asarray(15, jnp.int32),
        pin_mwn=jnp.asarray(0.0, jnp.float64))
    assert int(pin[7][2]) == 15, np.asarray(pin[7])
    assert int(pin[5]) <= 30  # whole-batch loop ends promptly
    # Retired through the ordinary kill path: every bound NaN (it never
    # reached any), t jumped to the final bound.
    assert np.isnan(np.asarray(pin[0][:, 0, 2])).all()
    assert float(pin[2][2]) == float(bounds[-1])
    # Healthy lanes bitwise-identical to the unpinned run.
    for lane in (0, 1, 3):
        np.testing.assert_array_equal(
            np.asarray(off[0][..., lane]), np.asarray(pin[0][..., lane]),
            err_msg=f"lane {lane}")


def test_pin_unreachable_thresholds_bitwise_noop():
    """pin enabled but unreachable == pin disabled, bitwise (the sentinel
    path and the armed path share one program shape)."""
    y0 = jnp.zeros((5, 8), jnp.float64).at[3].set(70.0)
    rhs = _osc_rhs(HARD, GROW)
    base = _run_dense(rhs, y0, BOUNDS[:3], 1e-3)
    armed = _run_dense(rhs, y0, BOUNDS[:3], 1e-3,
                       pin_limit=jnp.asarray(2 ** 20, jnp.int32),
                       pin_mwn=jnp.asarray(1e9))
    for i in range(10):
        np.testing.assert_array_equal(np.asarray(base[i]),
                                      np.asarray(armed[i]), err_msg=str(i))


def test_pin_counter_travels_through_peel(bs):
    """Peeled dense chunk with pin ON == unpeeled dense chunk with pin ON,
    bitwise -- the attempt counter must retire identically through
    suspend/gather/resume (tiny caps force every peel mechanism: a lane
    suspended below the budget must cross it mid-resume exactly like the
    uninterrupted loop). Uses a tight rtol so real lanes actually rack up
    attempts, and a low pin_limit so retirement fires across peel legs."""
    bg = tracer.make_background(bs, 0.0)
    slon, slat = tracer.source_matrix(0.0, 5.0, 36.0, 8.0, 5, 4)
    zwn = jnp.asarray([2.0, 4.0, 6.0])
    y0, _, _ = tracer.initialize(bg, jnp.asarray(slon), jnp.asarray(slat),
                                 zwn)
    r = y0.shape[1]
    dt = 7200.0
    rtol, atol = jnp.asarray(1e-10), jnp.asarray(1e-10)
    min_step = jnp.asarray(720.0)  # high floor => floor steps are common
    cut_off = jnp.asarray(0.2)
    h0 = tracer.initial_step_sizes(bg, y0, rtol, atol)
    t0 = jnp.zeros(r, jnp.float64)
    f0, _ = ray_mod.rhs(bg, y0)
    pinl = jnp.asarray(40, jnp.int32)
    pinm = jnp.asarray(3.0)  # low bar: let real lanes trip it

    cd = cp = (y0, t0, h0, f0, y0[0], y0[1])
    nt, chunk = 25, 12
    step = 1
    retired_any = False
    while step < nt:
        n = min(chunk, nt - step)
        bounds = jnp.arange(step, step + n, dtype=jnp.float64) * dt
        cd, (hd, ud, vd, _, _, lad) = tracer._rk45_group_chunk_dense(
            bg, *cd, bounds, cut_off, rtol, atol, min_step,
            pin_limit=pinl, pin_mwn=pinm)
        cp, (hp, up, vp, _, _, lap) = (
            tracer._rk45_group_chunk_dense_peeled(
                bg, *cp, bounds, cut_off, rtol, atol, min_step,
                caps=(6, 18), min_width=32,
                pin_limit=pinl, pin_mwn=pinm))
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
        retired_any = retired_any or bool(
            np.isnan(np.asarray(cd[0][0])).any())
        step += n
    # The scenario must actually exercise retirement, otherwise this test
    # proves nothing about the counter's suspend/resume path.
    assert retired_any, "tighten the scenario: no lane was pin-retired"


def test_pin_off_unreachable_through_driver(bs):
    """End-to-end: the chunked driver (the bench path) with unreachable pin
    thresholds is bitwise-identical to pin disabled."""
    cfg_off = RunConfig(**CFG)
    cfg_on = RunConfig(pin_limit=2 ** 20, pin_mwn=100.0, **CFG)
    off = trace_rays_chunked(bs, cfg_off, chunk_steps=16, verbose=False)
    on = trace_rays_chunked(bs, cfg_on, chunk_steps=16, verbose=False)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(off, k)), np.asarray(getattr(on, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k,
        )


def test_pin_off_unreachable_through_fused(bs):
    """The fused (non-chunked) dense runner takes pin as jit-traced Python
    scalars; unreachable thresholds must be bitwise pin-off there too."""
    off = tracer.trace_rays(bs, RunConfig(**CFG))
    on = tracer.trace_rays(bs, RunConfig(pin_limit=2 ** 20, pin_mwn=100.0,
                                         **CFG))
    for k in ("lon", "lat", "ky", "amp"):
        np.testing.assert_allclose(
            np.asarray(getattr(off, k)), np.asarray(getattr(on, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k,
        )


def test_pin_config_validation():
    base = dict(CFG)
    RunConfig(pin_limit=500, pin_mwn=50.0, **base).validate()
    with pytest.raises(ValueError, match="dense"):
        exact = dict(base, bound_mode="exact")
        RunConfig(pin_limit=500, **exact).validate()
    with pytest.raises(ValueError, match="positive"):
        RunConfig(pin_limit=0, **base).validate()
    with pytest.raises(ValueError, match="pin_mwn"):
        RunConfig(pin_limit=500, pin_mwn=150.0, **base).validate()
    # 0 is the measured production recommendation (attempts-only gating;
    # round-4 skew probes: real grinders hold |l| < 1 forever).
    RunConfig(pin_limit=500, pin_mwn=0.0, **base).validate()
    with pytest.raises(ValueError, match="pin_mwn"):
        RunConfig(pin_limit=500, pin_mwn=-1.0, **base).validate()
