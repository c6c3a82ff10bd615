"""Generic batched ODE API self-tests.

Mirrors the reference's embedded integrator self-test (rkf45.py:632-883:
closed-form ODEs + Lorenz vs scipy), which is how that code validates its
vendored RK45 as a general-purpose integrator.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rwrt_tpu.solvers.ode import solve_ivp_batched

pytestmark = []


def test_quadratic_closed_form():
    """dy/dt = 2t -> y = t^2; the reference expects ~1e-13 class accuracy
    for its vendored RK45 on this problem (rkf45.py:856-858 comments)."""
    t_eval = np.linspace(0.5, 5.0, 10)

    def f(t, y):
        return jnp.broadcast_to(2.0 * t, y.shape)

    sol = solve_ivp_batched(f, jnp.zeros(1, jnp.float64), t_eval,
                            rtol=1e-10, atol=1e-12)
    assert int(sol.status) == 0
    np.testing.assert_allclose(np.asarray(sol.ys)[:, 0], t_eval ** 2,
                               rtol=0, atol=1e-10)


def test_exponential_decay():
    def f(t, y):
        return -y

    sol = solve_ivp_batched(f, jnp.ones(1, jnp.float64), np.linspace(1, 4, 7),
                            rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol.ys)[:, 0],
                               np.exp(-np.linspace(1, 4, 7)),
                               rtol=1e-7)


def test_lorenz_vs_scipy():
    """Lorenz system (the reference's demo problem, rkf45.py:772-810)
    against scipy's RK45 at tight tolerance over a short horizon."""
    sp = pytest.importorskip("scipy.integrate")
    sigma, rho, beta = 10.0, 28.0, 8.0 / 3.0

    def f(t, y):
        x, yy, z = y
        return jnp.stack([sigma * (yy - x), x * (rho - z) - yy,
                          x * yy - beta * z])

    y0 = np.array([1.0, 1.0, 1.0])
    t_eval = np.linspace(0.25, 2.0, 8)
    sol = solve_ivp_batched(f, jnp.asarray(y0), t_eval,
                            rtol=1e-10, atol=1e-12)

    ref = sp.solve_ivp(
        lambda t, y: [sigma * (y[1] - y[0]),
                      y[0] * (rho - y[2]) - y[1],
                      y[0] * y[1] - beta * y[2]],
        (0.0, 2.0), y0, t_eval=t_eval, rtol=1e-10, atol=1e-12,
        method="RK45")
    np.testing.assert_allclose(np.asarray(sol.ys), ref.y.T, rtol=1e-5,
                               atol=1e-6)


def test_batched_lanes_equal_solo_runs():
    """Lanes never couple: a 3-lane batch equals each lane run alone,
    bitwise (the per-column independence of reference rkf45.py:375-514)."""
    def f(t, y):
        return -0.5 * y + jnp.sin(t)[None, :]

    y0 = jnp.asarray(np.array([[1.0, -2.0, 0.3], [0.0, 1.0, -1.0]]))
    t_eval = np.linspace(0.5, 3.0, 6)
    batched = solve_ivp_batched(f, y0, t_eval, rtol=1e-8, atol=1e-10)
    for lane in range(3):
        solo = solve_ivp_batched(f, y0[:, lane:lane + 1], t_eval,
                                 rtol=1e-8, atol=1e-10)
        np.testing.assert_array_equal(np.asarray(batched.ys)[:, :, lane],
                                      np.asarray(solo.ys)[:, :, 0])


def test_failed_lane_freezes_others_continue():
    """A lane whose RHS goes non-finite is frozen at NaN with status 1;
    healthy lanes are unaffected (per-column NaN handling, reference
    rkf45.py:398-403)."""
    def f(t, y):
        # lane blows up once y > 3: NaN derivative
        bad = y > 3.0
        return jnp.where(bad, jnp.nan, y)  # dy/dt = y (exp growth)

    y0 = jnp.asarray(np.array([[1.0, 1e-3]]))  # lane 0 crosses 3 quickly
    t_eval = np.linspace(0.5, 4.0, 8)
    sol = solve_ivp_batched(f, y0, t_eval, rtol=1e-9, atol=1e-12)
    status = np.asarray(sol.status)
    assert status[0] == 1
    assert status[1] == 0
    ys = np.asarray(sol.ys)
    assert np.isnan(ys[-1, 0, 0])
    np.testing.assert_allclose(ys[:, 0, 1], 1e-3 * np.exp(t_eval), rtol=1e-6)


def test_convergence_with_tolerance():
    """Tightening rtol tightens the answer (controller is actually
    controlling)."""
    def f(t, y):
        return jnp.cos(t)[None, :] * y

    y0 = jnp.ones((1, 1), jnp.float64)
    t_eval = np.array([3.0])
    exact = np.exp(np.sin(3.0))
    errs = []
    for rtol in (1e-4, 1e-7, 1e-10):
        sol = solve_ivp_batched(f, y0, t_eval, rtol=rtol, atol=1e-14)
        errs.append(abs(float(sol.ys[0, 0, 0]) - exact))
    assert errs[2] < errs[1] < errs[0]
    assert errs[2] < 1e-9


def test_rk4_fixed_golden_vs_reference_simple_rk4():
    """Golden: solve_ivp_rk4 equals the reference's general-purpose
    simple_rk4 (rkf45.py:729-769) on the Lorenz system, including the
    clamped remainder final step and the accumulated time bookkeeping."""
    from refshim import load_reference
    from rwrt_tpu.solvers.ode import solve_ivp_rk4

    load_reference()
    import rkf45 as ref_rkf45

    def lorenz_np(t, u, p=10.0, b=8.0 / 3.0, r=28.0):
        x, y, z = u
        return np.array([p * (y - x), x * (r - z) - y, x * y - b * z])

    def lorenz_jnp(t, u):
        x, y, z = u
        return jnp.stack([10.0 * (y - x), x * (28.0 - z) - y,
                          x * y - (8.0 / 3.0) * z])

    y0 = np.array([[1.0], [1.0], [1.0]])
    # dt chosen so (t_bound - t0) % dt != 0 -> exercises the clamped final
    # step (reference rkf45.py:750-753).
    t0, t_bound, dt = 0.0, 1.0, 0.03
    want_ys, want_ts = ref_rkf45.simple_rk4(lorenz_np, t0, y0, t_bound, dt)
    got_ys, got_ts = solve_ivp_rk4(lorenz_jnp, jnp.asarray(y0),
                                   t0=t0, t_bound=t_bound, dt=dt)
    np.testing.assert_allclose(np.asarray(got_ts), want_ts, rtol=0, atol=0)
    assert got_ys.shape == want_ys.shape
    np.testing.assert_allclose(np.asarray(got_ys), want_ys,
                               rtol=1e-12, atol=1e-12)


def test_rk4_fixed_squeeze_and_exact_division():
    """(d,) input squeezes; exact-division grid lands on t_bound with no
    remainder step; 4th-order accuracy on dy/dt = 2t (exact for RK4)."""
    from rwrt_tpu.solvers.ode import solve_ivp_rk4

    def f(t, y):
        return jnp.broadcast_to(2.0 * t, y.shape)

    ys, ts = solve_ivp_rk4(f, jnp.zeros(1, jnp.float64),
                           t0=0.0, t_bound=2.0, dt=0.25)
    assert ys.shape == (9, 1)
    np.testing.assert_allclose(np.asarray(ts), np.arange(9) * 0.25)
    np.testing.assert_allclose(np.asarray(ys)[:, 0],
                               (np.arange(9) * 0.25) ** 2, atol=1e-13)


def test_max_step_caps_attempts():
    """max_step bounds every attempted step (reference rkf45.py:14-19, 343:
    validated max_step caps h_abs); a loose-tolerance run that would take
    big steps must still sample densely enough to resolve fast forcing."""
    from rwrt_tpu.solvers.ode import solve_ivp_batched

    def f(t, y):
        return jnp.broadcast_to(jnp.cos(50.0 * t), y.shape)

    t_eval = np.linspace(1.0, 2.0, 3)
    loose = solve_ivp_batched(f, jnp.zeros(1, jnp.float64), t_eval,
                              rtol=1e-3, atol=1e-3)
    capped = solve_ivp_batched(f, jnp.zeros(1, jnp.float64), t_eval,
                               rtol=1e-3, atol=1e-3, max_step=0.01)
    want = np.sin(50.0 * t_eval) / 50.0
    err_loose = np.max(np.abs(np.asarray(loose.ys)[:, 0] - want))
    err_capped = np.max(np.abs(np.asarray(capped.ys)[:, 0] - want))
    assert err_capped < err_loose
    assert err_capped < 1e-6
    # capping forces more controller iterations
    assert int(capped.iters) > int(loose.iters)
    with pytest.raises(ValueError):
        solve_ivp_batched(f, jnp.zeros(1), t_eval, max_step=-1.0)
