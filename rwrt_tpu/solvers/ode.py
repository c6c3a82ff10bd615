"""Generic batched adaptive ODE integration (standalone Dormand-Prince 5(4)).

The reference vendors its RK45 as a general-purpose integrator and ships
standalone drivers plus a Lorenz/closed-form self-test under ``__main__``
(reference rkf45.py:632-883) -- users of that code can integrate ARBITRARY
ODEs with it, not just the ray equations. This module is that capability,
TPU-native: a fixed-shape masked ``lax.while_loop`` advancing n independent
lanes, each with its own (t, h, accept/reject) controller state, FSAL, and
the same tableau/controller constants as the flagship ray path
(solvers/rk45.py; scipy-RK45-compatible semantics, reference
rkf45.py:601-629, 410-501).

The flagship ray integration does NOT go through this module -- it uses the
specialized ``rk45.integrate_group`` whose RHS, masks and history layout are
fused for the ray state. This is the reusable general API.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from rwrt_tpu.solvers.rk45 import (
    DP_A,
    DP_B,
    DP_C,
    DP_E,
    ERROR_EXPONENT,
    MAX_FACTOR,
    MIN_FACTOR,
    SAFETY,
    validate_tol,
)


class OdeSolution(NamedTuple):
    """ys: (nt, d, n) states at ``t_eval``; status: (n,) int8 per lane
    (0 = ok, 1 = failed mid-run (non-finite RHS at the step floor), 2 = ran
    out of iterations); nfev: total RHS evaluations; iters: controller
    iterations actually executed."""

    ys: jnp.ndarray
    status: jnp.ndarray
    nfev: jnp.ndarray
    iters: jnp.ndarray


def _rms_norm(x):
    return jnp.sqrt(jnp.mean(jnp.square(x), axis=0))


def _dp_step(f, t, y, h, k1):
    """One Dormand-Prince 5(4) attempt for every lane.

    t, h: (n,); y, k1: (d, n). Returns (y5, k7, err) where err is the
    embedded 4th/5th-order error estimate (d, n). 6 fresh RHS evaluations
    (k1 is the FSAL carry).
    """
    ks = [k1]
    for i in range(1, 6):
        dy = ks[0] * DP_A[i][0]
        for j in range(1, i):
            if DP_A[i][j] != 0.0:
                dy = dy + ks[j] * DP_A[i][j]
        ks.append(f(t + DP_C[i] * h, y + dy * h))
    y5 = ks[0] * DP_B[0]
    for j in range(1, 6):
        if DP_B[j] != 0.0:
            y5 = y5 + ks[j] * DP_B[j]
    y5 = y + y5 * h
    k7 = f(t + h, y5)
    ks.append(k7)
    err = ks[0] * DP_E[0]
    for j in range(1, 7):
        if DP_E[j] != 0.0:
            err = err + ks[j] * DP_E[j]
    return y5, k7, err * h


def solve_ivp_rk4(f: Callable, y0, *, t0=0.0, t_bound, dt):
    """Fixed-step classical RK4 over [t0, t_bound] for a batch of lanes.

    The general-purpose fixed-step driver the reference vendors alongside
    its adaptive solver (``simple_rk4``, reference rkf45.py:729-769):
    uniform steps of ``dt`` from ``t0``, with the final step clamped to
    land exactly on ``t_bound``. ``f(t, y)``: t (n,) per-lane times,
    y (d, n) -> (d, n), matching :func:`solve_ivp_batched`; pass y0 (d,)
    for a single lane.

    Returns ``(ys, ts)``: ys (nt, d[, n]) including the initial state,
    ts (nt,) the step times (host-computed with the reference's exact
    accumulation bookkeeping, so outputs are comparable bit-for-bit).
    """
    y0 = jnp.asarray(y0)
    squeeze = y0.ndim == 1
    if squeeze:
        y0 = y0[:, None]
    n = y0.shape[1]
    dtype = y0.dtype

    # Host-side time bookkeeping, mirroring the reference loop
    # (rkf45.py:745-768): accumulated this_t/next_t, final step
    # this_dt = dt - next_t + t_bound.
    t0f, tbf, dtf = float(t0), float(t_bound), float(dt)
    ts = [t0f]
    stages = []  # (step start time, step size)
    this_t, next_t = t0f, t0f + dtf
    while this_t < tbf:
        h = dtf
        if next_t > tbf:
            h = dtf - next_t + tbf
            next_t = tbf
        if h <= 0.0:
            break
        ts.append(next_t)
        stages.append((this_t, h))
        this_t += dtf
        next_t += dtf

    t_in = jnp.asarray([a for a, _ in stages], dtype)
    h_in = jnp.asarray([b for _, b in stages], dtype)

    def step(y, th):
        t, h = th
        tv = jnp.full(n, t, dtype)
        k1 = f(tv, y)
        k2 = f(tv + 0.5 * h, y + 0.5 * h * k1)
        k3 = f(tv + 0.5 * h, y + 0.5 * h * k2)
        k4 = f(tv + h, y + h * k3)
        y_next = y + h / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        return y_next, y_next

    _, ys_scan = lax.scan(step, y0, (t_in, h_in))
    ys = jnp.concatenate([y0[None], ys_scan], axis=0)
    if squeeze:
        ys = ys[:, :, 0]
    return ys, jnp.asarray(ts, dtype)


def solve_ivp_batched(
    f: Callable,
    y0,
    t_eval,
    *,
    t0=0.0,
    rtol=1e-6,
    atol=1e-6,
    first_step=None,
    min_step=None,
    max_step=None,
    max_iters: int = 100_000,
) -> OdeSolution:
    """Integrate dy/dt = f(t, y) for a batch of independent lanes.

    f(t, y): t (n,) per-lane times, y (d, n) states -> (d, n) derivatives.
    Each lane runs its own adaptive controller (per-lane t, h,
    accept/reject -- the vectorized semantics of reference
    rkf45.py:375-514); lanes never couple, so a batched run equals each
    lane run alone. For a single trajectory pass y0 with n = 1.

    y0: (d,) or (d, n) initial state at t0. t_eval: increasing output
    times (> t0); integration steps to each bound exactly (clamped step,
    reference wr.py:808-830 semantics). min_step defaults to
    1e-3 * (t_eval[0] - t0) (the reference's Global_Minstep with its
    default MinStepFactor, wr.py:794); max_step (None = unbounded) caps the
    attempted step like the reference's validated max_step
    (rkf45.py:14-19, 343).

    Per-lane failure: a lane whose RHS goes non-finite at the step floor is
    frozen at NaN with status 1 (the batch continues -- the vector analogue
    of the reference's per-column NaN handling, rkf45.py:398-403).
    """
    y0 = jnp.asarray(y0)
    squeeze = y0.ndim == 1
    if squeeze:
        y0 = y0[:, None]
    dtype = y0.dtype
    n = y0.shape[1]
    t_eval = jnp.asarray(t_eval, dtype)
    t0 = jnp.asarray(t0, dtype)
    rtol = validate_tol(jnp.asarray(rtol, dtype), dtype)
    atol = jnp.asarray(atol, dtype)
    if min_step is None:
        min_step = 1e-3 * (float(t_eval[0]) - float(t0))
    min_step = jnp.asarray(min_step, dtype)
    if max_step is not None and float(max_step) <= 0.0:
        raise ValueError("max_step must be positive")
    max_step = jnp.asarray(jnp.inf if max_step is None else max_step, dtype)

    t = jnp.full(n, t0, dtype)
    k1 = f(t, y0)
    if first_step is None:
        # Hairer-style initial step from the first RHS sample (the scale of
        # y vs f; cheap single-sample variant of reference rkf45.py:34-99).
        scale = atol + jnp.abs(y0) * rtol
        d0 = _rms_norm(y0 / scale)
        d1 = _rms_norm(k1 / scale)
        h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
        h = jnp.minimum(h0.astype(dtype), t_eval[0] - t0)
    else:
        h = jnp.full(n, first_step, dtype)
    status = jnp.zeros(n, jnp.int8)
    # A lane whose initial state or first RHS sample is non-finite can never
    # integrate; without this it would get h = NaN and spin every interval's
    # while_loop to max_iters (NaN compares False against every exit test).
    # Freeze it at NaN with status 1 up front (rk45.integrate_interval's
    # done-on-NaN guard, specialized to initialization).
    bad0 = ~(jnp.isfinite(y0).all(axis=0) & jnp.isfinite(k1).all(axis=0))
    status = jnp.where(bad0, jnp.int8(1), status)
    y0 = jnp.where(bad0[None, :], jnp.nan, y0)
    h = jnp.where(bad0, min_step, h)

    def interval(carry, t_bound):
        y, t, h, k1, status, nfev, iters = carry

        def cond(st):
            _y, t, _h, _k1, _status, _nfev, it, done = st
            return jnp.any(~done) & (it < max_iters)

        def body(st):
            y, t, h, k1, status, nfev, it, done = st
            active = ~done
            h_step = jnp.clip(t_bound - t, 0.0, jnp.minimum(h, max_step))
            y5, k7, err = _dp_step(f, t, y, h_step, k1)
            scale = atol + jnp.maximum(jnp.abs(y), jnp.abs(y5)) * rtol
            err_norm = _rms_norm(err / scale)
            accept = err_norm <= 1.0  # NaN -> False (reject)
            # Dead lane: error not finite and no room left to shrink.
            dead = active & ~jnp.isfinite(err_norm) & (h_step <= min_step)
            factor = jnp.where(
                accept,
                jnp.clip(SAFETY * err_norm ** ERROR_EXPONENT,
                         MIN_FACTOR, MAX_FACTOR),
                jnp.maximum(MIN_FACTOR, SAFETY * err_norm ** ERROR_EXPONENT),
            )
            factor = jnp.where(jnp.isfinite(factor), factor, MIN_FACTOR)
            upd = active & accept & ~dead
            y = jnp.where(upd[None, :], y5, y)
            k1 = jnp.where(upd[None, :], k7, k1)
            t = jnp.where(upd, t + h_step, t)
            h = jnp.where(active & ~dead,
                          jnp.maximum(h_step * factor, min_step), h)
            y = jnp.where(dead[None, :], jnp.nan, y)
            status = jnp.where(dead, jnp.int8(1), status)
            done = done | dead | (t >= t_bound)
            nfev = nfev + 6 * jnp.sum(active)
            return y, t, h, k1, status, nfev, it + 1, done

        done0 = (t >= t_bound) | (status > 0)
        y, t, h, k1, status, nfev, it, done = lax.while_loop(
            cond, body, (y, t, h, k1, status, nfev, jnp.asarray(0), done0)
        )
        status = jnp.where(~done & (status == 0), jnp.int8(2), status)
        iters = iters + it
        return (y, t, h, k1, status, nfev, iters), y

    nfev0 = jnp.asarray(n)  # the FSAL seed evaluation
    (y, t, h, k1, status, nfev, iters), ys = lax.scan(
        interval, (y0, t, h, k1, status, nfev0, jnp.asarray(0)), t_eval
    )
    if squeeze:
        ys = ys[:, :, 0]
        status = status[0]
    return OdeSolution(ys=ys, status=status, nfev=nfev, iters=iters)
