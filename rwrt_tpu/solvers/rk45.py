"""Adaptive Dormand-Prince 5(4) with per-ray step control, fixed shapes.

TPU-native counterpart of the reference's vendored vector RK45 (reference
rkf45.py:102-629) and its driving loop (wr.py:767-887). The reference already
holds per-ray time, step size, and accept/reject lanes as vectors but loops on
host over pending-index subsets (rkf45.py:410-501); here that becomes a
fixed-shape ``lax.while_loop`` in which EVERY ray evaluates every iteration
and finished/accepted lanes are masked out. Per-ray accept/reject dynamics are
fully independent in the reference (error norm, scale, and factor are all
per-column), so flattening the two host loops (step retries x steps-within-
interval) into one device loop is exact, not an approximation.

Controller semantics preserved (reference file:line):
- Dormand-Prince tableau (rkf45.py:601-615);
- RMS error norm over the 5 state variables, scale = atol +
  max(|y|,|y_new|)*rtol (rkf45.py:372-373, 442-445);
- NaN error norms count as accepted with max growth (rkf45.py:446, 455);
- SAFETY=0.9, factor clip [0.2, 10], exponent -1/5 (rkf45.py:363-366);
- a step rejected earlier in the same step caps the growth factor at 1
  (rkf45.py:462-469);
- h is clamped up to Global_Minstep only when a NEW step starts, not between
  rejects (rkf45.py:383-387 runs once per _step_impl);
- per-ray initial step selection a la Hairer (rkf45.py:34-99);
- rays whose state is NaN at interval start are marked finished immediately
  and their t jumps to t_bound (rkf45.py:400-403); NaN times finish as
  t_bound (rkf45.py:503).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Dormand-Prince 5(4) tableau (reference rkf45.py:604-615). Plain Python
# floats (weak types) so they never promote a float32 carry to float64.
DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0)
DP_A = (
    (0.0, 0.0, 0.0, 0.0, 0.0),
    (1 / 5, 0.0, 0.0, 0.0, 0.0),
    (3 / 40, 9 / 40, 0.0, 0.0, 0.0),
    (44 / 45, -56 / 15, 32 / 9, 0.0, 0.0),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0.0),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
)
DP_B = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84)
DP_E = (
    -71 / 57600, 0.0, 71 / 16695, -71 / 1920, 17253 / 339200, -22 / 525, 1 / 40,
)

SAFETY = 0.9
MIN_FACTOR = 0.2
MAX_FACTOR = 10.0
ERROR_EXPONENT = -0.2  # -1/(error_estimator_order + 1), order 4.


def _norm(x):
    """RMS norm over the variable axis: ||x||_2 / sqrt(n) (rkf45.py:29-31)."""
    return jnp.sqrt(jnp.sum(x * x, axis=0) / x.shape[0])


def validate_tol(rtol, dtype):
    """Clamp rtol to 100 * eps of the compute dtype (reference
    rkf45.py:21-26) -- essential for float32 runs where rtol=1e-6 is below
    resolvable precision."""
    import numpy as _np

    return jnp.maximum(jnp.asarray(rtol, dtype), 100 * _np.finfo(dtype).eps)


def select_initial_step(rhs_fn, y0, f0, rtol, atol, t0=0.0):
    """Per-ray initial step (reference rkf45.py:34-99; direction = +1).

    Note the reference's smallness masks are built by zeroing where
    d > 1e-15, so NaN d counts as small; reproduced via ~(d > 1e-15).
    """
    scale = atol + jnp.abs(y0) * rtol
    d0 = _norm(y0 / scale)
    d1 = _norm(f0 / scale)
    h0 = 0.01 * d0 / d1
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, h0)

    y1 = y0 + h0 * f0
    f1 = rhs_fn(y1, t0 + h0)
    d2 = _norm((f1 - f0) / scale) / h0

    dm = jnp.fmax(d1, d2)  # np.nanmax semantics: ignore NaN unless both NaN.
    h1 = (0.01 / dm) ** (1.0 / 5.0)
    both_small = jnp.logical_not(d1 > 1e-15) & jnp.logical_not(d2 > 1e-15)
    h1 = jnp.where(both_small, jnp.maximum(1e-6, h0 * 1e-3), h1)
    return jnp.minimum(100.0 * h0, h1)


class _Carry(NamedTuple):
    y: jnp.ndarray         # (5, R)
    t: jnp.ndarray         # (R,)
    h: jnp.ndarray         # (R,) current |step|
    f: jnp.ndarray         # (5, R) rhs at (t, y) -- FSAL carry
    rejected: jnp.ndarray  # (R,) bool: rejected earlier within current step
    new_step: jnp.ndarray  # (R,) bool: next attempt starts a fresh step
    done: jnp.ndarray      # (R,) bool: reached t_bound
    iters: jnp.ndarray     # scalar attempt counter
    nfev: jnp.ndarray      # scalar RHS-evaluation counter (x batch)


def integrate_interval(
    rhs_fn, y, t, h, t_bound, rtol, atol, min_step, max_iters: int = 100_000
):
    """Advance every ray from its own t to t_bound with adaptive stepping.

    Equivalent to the reference's `while status is None: solver.step()` over
    one output interval (wr.py:814-830 driving rkf45.py:375-514).

    Returns (y, t, h, iters, nfev_like) -- iters is the number of while-loop
    attempts (each costs one full 7-stage evaluation for the whole batch).
    """
    done = jnp.isnan(jnp.mean(y, axis=0))
    t = jnp.where(done, t_bound, t)
    done = done | (t >= t_bound)

    carry = _Carry(
        y=y, t=t, h=h,
        f=rhs_fn(y, t),
        rejected=jnp.zeros(t.shape, bool),
        new_step=jnp.ones(t.shape, bool),
        done=done,
        iters=jnp.zeros((), jnp.int32),
        nfev=jnp.zeros((), jnp.int32),
    )

    def cond(c: _Carry):
        return jnp.any(~c.done) & (c.iters < max_iters)

    def body(c: _Carry) -> _Carry:
        # FSAL: K0 = rhs(t, y) is carried -- for retry lanes y is unchanged
        # so the previous value is exact; for freshly-accepted lanes the
        # 7th stage f_new below IS rhs at the new state (Dormand-Prince's
        # first-same-as-last property). The reference recomputes it each
        # step (rkf45.py:378) with identical value.
        f0 = c.f
        heff = jnp.where(c.new_step, jnp.maximum(c.h, min_step), c.h)
        t_new = c.t + heff
        t_new = jnp.where(t_new > t_bound, t_bound, t_new)
        hstep = t_new - c.t

        k = [f0]
        for s in range(1, 6):
            dy = hstep[None, :] * sum(
                DP_A[s][j] * k[j] for j in range(s) if DP_A[s][j] != 0.0
            )
            k.append(rhs_fn(c.y + dy, c.t + DP_C[s] * hstep))
        y_new = c.y + hstep[None, :] * sum(DP_B[j] * k[j] for j in range(6))
        f_new = rhs_fn(y_new, t_new)
        k.append(f_new)

        err = hstep[None, :] * sum(DP_E[j] * k[j] for j in range(7))
        scale = atol + jnp.maximum(jnp.abs(c.y), jnp.abs(y_new)) * rtol
        error_norm = _norm(err / scale)
        error_norm = jnp.where(jnp.isnan(error_norm), 0.0, error_norm)

        accept = error_norm < 1.0
        raw = SAFETY * error_norm ** ERROR_EXPONENT  # error 0 -> inf
        fac_acc = jnp.minimum(MAX_FACTOR, raw)
        fac_acc = jnp.where(c.rejected, jnp.minimum(1.0, fac_acc), fac_acc)
        fac_rej = jnp.maximum(MIN_FACTOR, raw)
        h_next = jnp.where(accept, hstep * fac_acc, hstep * fac_rej)

        act = ~c.done
        upd = act & accept
        y_out = jnp.where(upd[None, :], y_new, c.y)
        f_out = jnp.where(upd[None, :], f_new, c.f)
        t_out = jnp.where(upd, t_new, c.t)
        t_out = jnp.where(jnp.isnan(t_out), t_bound, t_out)
        h_out = jnp.where(act, h_next, c.h)
        rejected_out = jnp.where(act, ~accept, c.rejected)
        new_step_out = jnp.where(act, accept, c.new_step)
        done_out = c.done | (upd & (t_out >= t_bound))
        return _Carry(
            y=y_out, t=t_out, h=h_out, f=f_out,
            rejected=rejected_out, new_step=new_step_out, done=done_out,
            iters=c.iters + 1, nfev=c.nfev + 6,
        )

    out = jax.lax.while_loop(cond, body, carry)
    return out.y, out.t, out.h, out.iters, out.nfev
