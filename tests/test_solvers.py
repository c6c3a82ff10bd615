"""Integrator self-tests (mirroring the reference's rkf45.py __main__ block):
closed-form ODE accuracy and adaptive-controller behavior."""

import numpy as np
import jax.numpy as jnp

from rwrt_tpu.solvers import rk45 as rk45_mod


def _integrate(rhs_fn, y0, t_end, n_out, rtol, atol, min_step=1e-9):
    """Drive integrate_interval over n_out output times like the tracer."""
    y = jnp.asarray(y0)
    t = jnp.zeros(y.shape[1], y.dtype)
    f0 = rhs_fn(y)
    h = rk45_mod.select_initial_step(rhs_fn, y, f0, rtol, atol)
    outs = [np.asarray(y)]
    for i in range(1, n_out + 1):
        tb = jnp.asarray(t_end * i / n_out, y.dtype)
        y, t, h, iters, nfev = rk45_mod.integrate_interval(
            rhs_fn, y, t, h, tb, rtol, atol, jnp.asarray(min_step, y.dtype)
        )
        outs.append(np.asarray(y))
    return np.stack(outs)


def test_rk45_exponential_accuracy():
    """dy/dt = 0.1*y from y0=10 over t in [0, 40]; the reference quotes
    ~1e-13 error for its vendored RK45 on comparable problems
    (rkf45.py:856-858, 880-882)."""
    lam = 0.1

    def rhs(y, t=0.0):
        return lam * y

    y0 = np.array([[10.0, 20.0]])
    ys = _integrate(rhs, y0, 40.0, 40, rtol=1e-12, atol=1e-12)
    want = np.array([10.0, 20.0])[None] * np.exp(
        lam * np.linspace(0, 40, 41)
    )[:, None]
    rel = np.abs(ys[:, 0, :] - want) / want
    assert rel.max() < 1e-10, rel.max()


def test_rk45_tolerance_scaling():
    """Looser tolerance => fewer function evals and larger error."""
    def rhs(y, t=0.0):
        return jnp.stack([y[1], -y[0]])  # harmonic oscillator

    y0 = np.array([[1.0], [0.0]])

    errs, evals = [], []
    for rtol in (1e-4, 1e-8):
        y = jnp.asarray(y0)
        t = jnp.zeros(1)
        h = rk45_mod.select_initial_step(rhs, y, rhs(y), rtol, rtol)
        y, t, h, iters, nfev = rk45_mod.integrate_interval(
            rhs, y, t, h, jnp.asarray(2 * np.pi), rtol, rtol, jnp.asarray(1e-9)
        )
        errs.append(abs(float(y[0, 0]) - 1.0))
        evals.append(int(nfev))
    assert errs[0] > errs[1]
    assert evals[0] < evals[1]


def test_rk45_per_ray_independence():
    """Stiff and smooth rays in one batch: each gets its own step sequence,
    and results match integrating them separately."""
    def rhs(y, t=0.0):
        # ray 0: fast oscillation; ray 1: slow linear growth
        w = jnp.asarray([20.0, 0.01])
        return jnp.stack([y[1], -w * w * y[0]])

    y0 = np.array([[1.0, 1.0], [0.0, 0.0]])
    ys = _integrate(rhs, y0, 1.0, 4, rtol=1e-9, atol=1e-9)

    y_sep = []
    for i in range(2):
        def rhs_i(y, t=0.0, i=i):
            w = jnp.asarray([[20.0, 0.01][i]])
            return jnp.stack([y[1], -w * w * y[0]])

        y_sep.append(_integrate(rhs_i, y0[:, i : i + 1], 1.0, 4, 1e-9, 1e-9))
    sep = np.concatenate(y_sep, axis=-1)
    np.testing.assert_allclose(ys, sep, rtol=1e-12, atol=1e-12)


def test_rk45_nan_rays_finish_immediately():
    def rhs(y, t=0.0):
        return 0.1 * y

    y0 = np.array([[1.0, np.nan]])
    y = jnp.asarray(y0)
    t = jnp.zeros(2)
    h = jnp.asarray([1.0, np.nan])
    y, t, h, iters, nfev = rk45_mod.integrate_interval(
        rhs, y, t, h, jnp.asarray(10.0), jnp.asarray(1e-6), jnp.asarray(1e-6),
        jnp.asarray(1e-3),
    )
    assert np.isnan(np.asarray(y)[0, 1])
    assert np.isfinite(np.asarray(y)[0, 0])
    assert np.asarray(t)[1] == 10.0  # dead ray jumped to t_bound


def test_rk4_fourth_order_convergence(jet_field):
    """Halving dt must cut RK4 trajectory error ~16x (4th order), measured
    against a tight-tolerance RK45 solution of the same ray problem."""
    import rwrt_tpu as rt
    from rwrt_tpu.config import RunConfig

    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    base = dict(zwn=(3.0,), sw_lon=40.0, sw_lat=25.0, dlon=1.0, dlat=1.0,
                nnx=1, nny=1, ttotal=2 * 86400.0, cal_dtype="float64")

    ref = rt.trace_rays(bs, RunConfig(integrator="rk45", tstep=2 * 3600.0,
                                      rtol=1e-12, atol=1e-12, **base))
    errs = {}
    for tstep in (4 * 3600.0, 2 * 3600.0):
        t = rt.trace_rays(bs, RunConfig(integrator="rk4", tstep=tstep, **base))
        stride = int(tstep // (2 * 3600.0))
        la = np.asarray(t.lat)[:, 0, 0, 0]
        lo = np.asarray(t.lon)[:, 0, 0, 0]
        la_r = np.asarray(ref.lat)[::stride, 0, 0, 0][: len(la)]
        lo_r = np.asarray(ref.lon)[::stride, 0, 0, 0][: len(lo)]
        ok = np.isfinite(la) & np.isfinite(la_r)
        errs[tstep] = np.max(np.hypot(la[ok] - la_r[ok], lo[ok] - lo_r[ok]))
    ratio = errs[4 * 3600.0] / errs[2 * 3600.0]
    assert ratio > 8.0, f"convergence ratio {ratio} (expected ~16 for 4th order)"


def test_grouped_intervals_equal_barrier(jet_field):
    """integrate_group (async per-ray interval advancement) must reproduce
    the per-interval barrier path exactly, including kill masks and NaN
    propagation."""
    import jax.numpy as jnp
    import rwrt_tpu as rt
    from rwrt_tpu import tracer
    from rwrt_tpu.models import ray as ray_mod

    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    bg = tracer.make_background(bs, 0.0)
    slon, slat = tracer.source_matrix(0.0, 5.0, 36.0, 8.0, 5, 4)
    zwn = jnp.asarray([2.0, 4.0, 6.0])
    y0, ug0, vg0 = tracer.initialize(
        bg, jnp.asarray(slon), jnp.asarray(slat), zwn)

    dt = jnp.asarray(2 * 3600.0, jnp.float64)
    nt = 49  # 4 days
    cut_off = jnp.asarray(0.2)
    rtol = jnp.asarray(1e-6)
    atol = jnp.asarray(1e-6)
    min_step = jnp.asarray(7.2)
    bounds = jnp.arange(1, nt, dtype=jnp.float64) * dt

    # barrier
    h0 = tracer.initial_step_sizes(bg, y0, rtol, atol)
    t0 = jnp.zeros(y0.shape[1], jnp.float64)
    _, (ys_b, ug_b, vg_b, it_b, _) = tracer._rk45_chunk(
        bg, y0, t0, h0, bounds, cut_off, rtol, atol, min_step)

    # grouped (group size 8, uneven tail of 48 % 8 == 0 -> use 7 to test tail)
    def rhs_fn(yy, tt=0.0):
        dy, _ = ray_mod.rhs(bg, yy, tt)
        return dy

    carry = (y0, t0, h0, rhs_fn(y0, t0), y0[0], y0[1])
    hists, ugs, vgs, iters_g = [], [], [], 0
    g = 7
    i = 0
    while i < nt - 1:
        bsl = bounds[i : i + g]
        carry, (hist, ug, vg, it, _, _la) = tracer._rk45_group_chunk(
            bg, *carry, bsl, cut_off, rtol, atol, min_step)
        hists.append(np.asarray(hist))
        ugs.append(np.asarray(ug))
        vgs.append(np.asarray(vg))
        iters_g += int(it)
        i += len(bsl)

    ys_g = np.concatenate(hists, axis=0)
    ug_g = np.concatenate(ugs, axis=0)
    vg_g = np.concatenate(vgs, axis=0)

    np.testing.assert_allclose(ys_g, np.asarray(ys_b), rtol=0, atol=0,
                               equal_nan=True)
    np.testing.assert_allclose(ug_g, np.asarray(ug_b), rtol=0, atol=0,
                               equal_nan=True)
    np.testing.assert_allclose(vg_g, np.asarray(vg_b), rtol=0, atol=0,
                               equal_nan=True)
    # and it should not take MORE iterations than the barrier path
    assert iters_g <= int(np.asarray(it_b).sum())


def test_bucketed_chunk_bitwise_equal_and_lane_attempts(jet_field):
    """_rk45_group_chunk_bucketed must match _rk45_group_chunk bitwise across
    chunks (with the lane_attempts feedback loop), and the per-lane attempt
    counter must explain the unbucketed loop's trip count
    (max(lane_attempts) == iters)."""
    import jax.numpy as jnp
    import rwrt_tpu as rt
    from rwrt_tpu import tracer
    from rwrt_tpu.models import ray as ray_mod

    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    bg = tracer.make_background(bs, 0.0)
    rng = np.random.default_rng(1)
    ns = 37  # odd source count -> lane count not divisible by the buckets
    slon = jnp.asarray(rng.uniform(0, 2 * np.pi, ns))
    slat = jnp.asarray(rng.uniform(-1.2, 1.2, ns))
    zwn = jnp.asarray([1.0, 3.0, 5.0])
    y0, _, _ = tracer.initialize(bg, slon, slat, zwn)  # has NaN rootless lanes
    r = y0.shape[1]

    dt = 7200.0
    rtol = jnp.asarray(1e-6)
    atol = jnp.asarray(1e-6)
    min_step = jnp.asarray(7.2)
    cut_off = jnp.asarray(0.2)
    h0 = tracer.initial_step_sizes(bg, y0, rtol, atol)
    t0 = jnp.zeros(r, jnp.float64)
    f0, _ = ray_mod.rhs(bg, y0)

    carry_p = (y0, t0, h0, f0, y0[0], y0[1])
    carry_b = carry_p
    att = jnp.full(r, -1, jnp.int32)
    nt = 49
    step, chunk = 1, 16
    while step < nt:
        n = min(chunk, nt - step)
        bounds = jnp.arange(step, step + n, dtype=jnp.float64) * dt
        carry_p, (hp, up, vp, itp, _, lap) = tracer._rk45_group_chunk(
            bg, *carry_p, bounds, cut_off, rtol, atol, min_step)
        carry_b, (hb, ub, vb, itb, _, att) = tracer._rk45_group_chunk_bucketed(
            bg, *carry_b, bounds, cut_off, rtol, atol, min_step, att,
            k_buckets=4)
        assert int(np.asarray(lap).max()) == int(np.asarray(itp))
        assert np.asarray(itb).shape == (4,)
        for a, b, name in [(hp, hb, "hist"), (up, ub, "ug"), (vp, vb, "vg"),
                           (lap, att, "lane_att")]:
            a, b = np.asarray(a), np.asarray(b)
            same = (a == b) | (np.isnan(a) & np.isnan(b)) if a.dtype.kind == "f" else (a == b)
            assert same.all(), (name, step)
        for a, b in zip(carry_p, carry_b):
            a, b = np.asarray(a), np.asarray(b)
            same = (a == b) | (np.isnan(a) & np.isnan(b))
            assert same.all(), ("carry", step)
        step += n


def test_amp_nan_lane_group_equals_barrier(jet_field):
    """A lane whose AMPLITUDE is NaN while its dynamics rows stay finite
    (mid-run amp overflow) must freeze exactly like the barrier path: state
    emitted unchanged at every bound with finite, bound-evaluated (ug, vg).
    The grouped path used to keep integrating such lanes (divergent output
    depending on interval_batch); it now walks them bound by bound."""
    import rwrt_tpu as rt
    from rwrt_tpu import tracer
    from rwrt_tpu.models import ray as ray_mod

    u, v, lat, lon = jet_field
    frames = np.stack([u, u * 1.3])
    vfr = np.stack([v, v])
    for bs in (rt.prepare(u, v, lat, lon, cal_dtype="float64"),
               rt.prepare_time_varying(frames, vfr, lat, lon,
                                       bg_dt=2 * 86400.0,
                                       cal_dtype="float64")):
        bg = tracer.make_background(bs, 0.0)
        slon, slat = tracer.source_matrix(0.0, 5.0, 72.0, 10.0, 3, 2)
        zwn = jnp.asarray([3.0, 5.0])
        y0, ug0, vg0 = tracer.initialize(
            bg, jnp.asarray(slon), jnp.asarray(slat), zwn)
        # Inject the pathological state into two born lanes.
        born = np.flatnonzero(np.isfinite(np.asarray(y0[4])))
        y0 = y0.at[4, born[0]].set(jnp.nan)
        y0 = y0.at[4, born[2]].set(jnp.nan)

        dt = jnp.asarray(2 * 3600.0, jnp.float64)
        nt = 13
        cut_off = jnp.asarray(0.2)
        rtol = jnp.asarray(1e-6)
        atol = jnp.asarray(1e-6)
        min_step = jnp.asarray(7.2)
        bounds = jnp.arange(1, nt, dtype=jnp.float64) * dt

        h0 = tracer.initial_step_sizes(bg, y0, rtol, atol)
        t0 = jnp.zeros(y0.shape[1], jnp.float64)
        _, (ys_b, ug_b, vg_b, _, _) = tracer._rk45_chunk(
            bg, y0, t0, h0, bounds, cut_off, rtol, atol, min_step)

        def rhs_fn(yy, tt=0.0):
            dy, _ = ray_mod.rhs(bg, yy, tt)
            return dy

        carry = (y0, t0, h0, rhs_fn(y0, t0), y0[0], y0[1])
        hists, ugs, vgs = [], [], []
        i = 0
        while i < nt - 1:
            bsl = bounds[i : i + 5]
            carry, (hist, ug, vg, _, _, _la) = tracer._rk45_group_chunk(
                bg, *carry, bsl, cut_off, rtol, atol, min_step)
            hists.append(np.asarray(hist))
            ugs.append(np.asarray(ug))
            vgs.append(np.asarray(vg))
            i += len(bsl)

        ys_g = np.concatenate(hists, axis=0)
        np.testing.assert_allclose(ys_g, np.asarray(ys_b), rtol=0, atol=0,
                                   equal_nan=True)
        # gv: bitwise for static backgrounds; the time-varying stage-7
        # fusion carries a pre-existing ~1e-14 ULP wobble vs the post-pass
        # (same on the unpatched tree; t-lerp arithmetic order).
        np.testing.assert_allclose(np.concatenate(ugs), np.asarray(ug_b),
                                   rtol=1e-12, atol=1e-12, equal_nan=True)
        np.testing.assert_allclose(np.concatenate(vgs), np.asarray(vg_b),
                                   rtol=1e-12, atol=1e-12, equal_nan=True)
        # The frozen lane's emissions: unchanged position, FINITE gv.
        lane = born[0]
        np.testing.assert_array_equal(
            ys_g[:, 0, lane], np.full(nt - 1, float(y0[0, lane])))
        assert np.isfinite(np.concatenate(ugs)[:, lane]).all()
