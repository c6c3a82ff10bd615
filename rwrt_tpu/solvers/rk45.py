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

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rwrt_tpu.constants import pi

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

# Dense-output interpolant for Dormand-Prince 5(4): the standard quartic
# y(t + theta*h) = y + h * sum_i b_i(theta) k_i with
# b_i(theta) = sum_j DP_P[i][j] * theta^(j+1) (scipy RK45.P; these are
# published interpolant constants of the method, like the tableau itself).
# At theta=1 each row sums to DP_B (b7 row sums to 0), so the interpolant
# reproduces y_new exactly in exact arithmetic.
DP_P = (
    (1.0, -8048581381 / 2820520608, 8663915743 / 2820520608,
     -12715105075 / 11282082432),
    (0.0, 0.0, 0.0, 0.0),
    (0.0, 131558114200 / 32700410799, -68118460800 / 10900136933,
     87487479700 / 32700410799),
    (0.0, -1754552775 / 470086768, 14199869525 / 1410260304,
     -10690763975 / 1880347072),
    (0.0, 127303824393 / 49829197408, -318862633887 / 49829197408,
     701980252875 / 199316789632),
    (0.0, -282668133 / 205662961, 2019193451 / 616988883,
     -1453857185 / 822651844),
    (0.0, 40617522 / 29380423, -110615467 / 29380423, 69997945 / 29380423),
)


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
        # zeros_like/ones_like (not fresh constants) so the lanes inherit
        # the carry's sharding/varying-axis type under shard_map.
        rejected=jnp.zeros_like(t, dtype=bool),
        new_step=jnp.ones_like(t, dtype=bool),
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


class _GroupCarry(NamedTuple):
    y: jnp.ndarray         # (5, R)
    t: jnp.ndarray         # (R,)
    h: jnp.ndarray         # (R,)
    f: jnp.ndarray         # (5, R) FSAL carry
    rejected: jnp.ndarray  # (R,) bool
    new_step: jnp.ndarray  # (R,) bool
    idx: jnp.ndarray       # (R,) int32: which bound each ray works toward
    hist: jnp.ndarray      # (G, 7, R) saved [state(5), ug, vg] per bound
    prev_lon: jnp.ndarray  # (R,) last saved lon (for the haversine kill)
    prev_lat: jnp.ndarray  # (R,)
    iters: jnp.ndarray
    nfev: jnp.ndarray
    lane_att: jnp.ndarray  # (R,) int32: per-lane step attempts in this group


def group_entry_state(y, bounds):
    """NaN-entry prefill for the EXACT grouped integrator -- the ONE copy
    shared by ``integrate_group(state0=None)`` and the peel scheduler's
    first leg (tracer._group_init_state); the peel paths' bitwise equality
    with the unpeeled chunk depends on both using identical entry state.

    Rays with any NaN component at entry (e.g. rootless slots: finite
    position, NaN wavenumber/amp from initialization) never advance; the
    barrier path saves their UNCHANGED state at every bound (the interval
    entry marks them accepted with y untouched, and the kill masks cannot
    trigger on an unchanged state). Pre-fill all their slots and finish
    them outright. Their (ug, vg) rows are NaN: any NaN state component
    makes group_velocity NaN through its inputs (position -> fields, or
    the NaN wavenumber/kappa) for every state the initializer or the kill
    masks can produce.

    Returns (hist0 (G, 7, R), rejected0, new_step0, lane_att0, idx0,
    t_shift) where t_shift is bounds[-1] for finished-at-entry lanes and
    NaN elsewhere -- apply as ``t = where(isnan(t_shift), t, t_shift)``.
    """
    g = bounds.shape[0]
    r = y.shape[1]
    # Entry-finish keys on the DYNAMICS rows (lon, lat, kx, ky): for those
    # lanes the barrier path emits NaN (ug, vg) at every bound (a NaN
    # position or wavenumber makes group_velocity NaN through its inputs),
    # so prefilling and finishing them is exact. An AMP-only-NaN lane
    # (mid-run overflow; positions finite) is NOT finished here: its
    # per-bound (ug, vg) are finite and, for time-varying backgrounds,
    # bound-dependent -- integrate_group's frozen-lane path walks it one
    # bound per iteration instead, matching the barrier path exactly.
    nan_dyn = jnp.isnan(jnp.mean(y[:4], axis=0))
    idx0 = jnp.where(nan_dyn, g, 0).astype(jnp.int32)
    t_shift = jnp.where(nan_dyn, bounds[-1], jnp.nan)
    hist0 = jnp.where(
        nan_dyn[None, None, :],
        jnp.concatenate(
            [jnp.broadcast_to(y[None], (g,) + y.shape),
             jnp.full((g, 2, r), jnp.nan, y.dtype)], axis=1),
        jnp.nan,
    ).astype(y.dtype)
    # zeros_like/ones_like over a lane of y (not fresh constants) so the
    # flags inherit the carry's sharding/varying-axis type under shard_map.
    return (hist0, jnp.zeros_like(y[0], dtype=bool),
            jnp.ones_like(y[0], dtype=bool),
            jnp.zeros_like(y[0], dtype=jnp.int32), idx0, t_shift)


def dense_entry_state(y, bounds):
    """NaN-entry prefill for the DENSE grouped integrator -- shared by
    ``integrate_group_dense(state0=None)`` and tracer._dense_init_state
    (same bitwise-equality contract as ``group_entry_state``).

    Frozen/dead lanes keep their entry state at every bound (rootless
    lanes: finite position, NaN wavenumber -- reference rkf45.py:400-403);
    live lanes' slots start NaN and are filled on emission. Returns
    (hist0 (G, 5, R), rejected0, new_step0, lane_att0, t_shift).
    """
    g = bounds.shape[0]
    nan_mean = jnp.isnan(jnp.mean(y, axis=0))
    t_shift = jnp.where(nan_mean, bounds[-1], jnp.nan)
    hist0 = jnp.where(
        nan_mean[None, None, :],
        jnp.broadcast_to(y[None], (g,) + y.shape),
        jnp.nan,
    ).astype(y.dtype)
    # zeros_like/ones_like over a lane of y (not fresh constants) so the
    # flags inherit the carry's sharding/varying-axis type under shard_map.
    return (hist0, jnp.zeros_like(y[0], dtype=bool),
            jnp.ones_like(y[0], dtype=bool),
            jnp.zeros_like(y[0], dtype=jnp.int32), t_shift)


def integrate_group(
    rhs_fn, rhs_gv_fn, y, t, h, f, bounds, prev_lon, prev_lat, cut_off,
    rtol, atol, min_step, max_iters=1_000_000, state0=None,
):
    """Advance every ray through a GROUP of output bounds asynchronously.

    Numerically IDENTICAL to calling integrate_interval once per bound with
    the tracer's kill-mask/reset between intervals (tests assert equality):
    the adaptive controller is per-ray independent, each ray still clamps to
    and stops at every bound, applies the termination masks against its own
    previously-saved state (reference wr.py:831-885), and continues from the
    masked state. What changes is only WHEN rays compute: a ray that finishes
    bound j proceeds immediately to bound j+1 instead of idling until the
    whole batch finishes j. This removes the per-interval straggler barrier:
    total while-iterations become max-over-rays of total attempts in the
    group rather than a sum of per-interval maxima (~2x fewer at 100k rays).

    The 7th (FSAL) stage samples the background exactly at the state being
    saved, so the per-bound output (ug, vg) re-derivation (reference
    wr.py:737-746) is computed from that sample via ``rhs_gv_fn`` and stored
    as history rows 5-6 -- identical values to a post-pass
    ``group_velocity_at`` at the saved states, without its second gather
    sweep over G x R rows.

    Args:
      rhs_fn: y, t -> dy (5, R).
      rhs_gv_fn: y, t -> (dy, ug, vg) -- same dy, plus raw-ky group velocity
        of the evaluated state (models/ray.py rhs_and_gv).
      f: (5, R) rhs at (t, y) (FSAL carry; pass rhs_fn(y, t) at t=0).
      bounds: (G,) increasing output times.

    Returns:
      (hist (G, 7, R), y, t, h, f, prev_lon, prev_lat, iters, nfev,
      lane_attempts, rejected, new_step, idx) -- lane_attempts (R,) int32
      counts each lane's step attempts in this group (the cost signal for
      difficulty-bucketed scheduling: the while-loop trip count is
      max(lane_attempts)); the last three are controller flags for
      suspend/resume (below).

    SUSPEND/RESUME (the peel scheduler's primitive, mirroring
    integrate_group_dense): the loop stops once ``iters`` reaches
    ``max_iters`` (may be a traced scalar); the returned (y, t, h, f,
    prev_lon, prev_lat) plus the (hist, rejected, new_step, lane_attempts,
    idx) tail form a complete mid-chunk snapshot. Passing the tail back via
    ``state0`` (possibly gathered to a lane SUBSET -- every per-lane
    quantity is independent) continues the integration bitwise-exactly;
    lanes with idx == G re-enter as finished no-ops. With ``state0`` the
    NaN-entry prefill is skipped: the caller must have applied it once
    (tracer._group_init_state) before the first leg.
    """
    g = bounds.shape[0]
    r = t.shape[0]
    if state0 is None:
        (hist0, rejected0, new_step0, lane_att0, idx0,
         t_shift) = group_entry_state(y, bounds)
        t = jnp.where(jnp.isnan(t_shift), t, t_shift)
    else:
        hist0, rejected0, new_step0, lane_att0, idx0 = state0

    carry = _GroupCarry(
        y=y, t=t, h=h, f=f,
        rejected=rejected0,
        new_step=new_step0,
        idx=idx0,
        hist=hist0,
        prev_lon=prev_lon, prev_lat=prev_lat,
        iters=jnp.zeros((), jnp.int32),
        nfev=jnp.zeros((), jnp.int32),
        lane_att=lane_att0,
    )

    def cond(c: _GroupCarry):
        return jnp.any(c.idx < g) & (c.iters < max_iters)

    def body(c: _GroupCarry) -> _GroupCarry:
        done = c.idx >= g
        bound = jnp.take(bounds, jnp.minimum(c.idx, g - 1))

        # FROZEN lanes: amp NaN but dynamics rows finite (mid-run amplitude
        # overflow). The barrier path freezes them at the next interval
        # entry and then emits the unchanged state with group_velocity_at
        # (finite; bound-dependent for time-varying backgrounds) at every
        # later bound. Walk them one bound per loop iteration: zero-length
        # "step" to the bound, state unchanged, (ug, vg) from the shared
        # stage-7 evaluation at (frozen state, bound).
        frozen = ~done & jnp.isnan(c.y[4]) & ~jnp.isnan(
            jnp.mean(c.y[:4], axis=0))

        f0 = c.f
        heff = jnp.where(c.new_step, jnp.maximum(c.h, min_step), c.h)
        t_new = c.t + heff
        t_new = jnp.where(t_new > bound, bound, t_new)
        t_new = jnp.where(frozen, bound, t_new)
        hstep = t_new - c.t

        k = [f0]
        for s in range(1, 6):
            dy = hstep[None, :] * sum(
                DP_A[s][j] * k[j] for j in range(s) if DP_A[s][j] != 0.0
            )
            k.append(rhs_fn(c.y + dy, c.t + DP_C[s] * hstep))
        y_new = c.y + hstep[None, :] * sum(DP_B[j] * k[j] for j in range(6))
        y_new = jnp.where(frozen[None, :], c.y, y_new)
        f_new, ug_new, vg_new = rhs_gv_fn(y_new, t_new)
        k.append(f_new)

        err = hstep[None, :] * sum(DP_E[j] * k[j] for j in range(7))
        scale = atol + jnp.maximum(jnp.abs(c.y), jnp.abs(y_new)) * rtol
        error_norm = _norm(err / scale)
        error_norm = jnp.where(jnp.isnan(error_norm), 0.0, error_norm)

        accept = (error_norm < 1.0) | frozen
        raw = SAFETY * error_norm ** ERROR_EXPONENT
        fac_acc = jnp.minimum(MAX_FACTOR, raw)
        fac_acc = jnp.where(c.rejected, jnp.minimum(1.0, fac_acc), fac_acc)
        fac_rej = jnp.maximum(MIN_FACTOR, raw)
        h_next = jnp.where(accept, hstep * fac_acc, hstep * fac_rej)
        h_next = jnp.where(frozen, c.h, h_next)

        act = ~done
        upd = act & accept
        t_out = jnp.where(upd, t_new, c.t)
        t_out = jnp.where(act & jnp.isnan(t_out), bound, t_out)
        crossing = upd & (t_out >= bound)

        y_upd = jnp.where(upd[None, :], y_new, c.y)
        # Termination masks at the bound, against the ray's own previously
        # saved state (reference wr.py:838-850).
        dlon = y_upd[0] - c.prev_lon
        dlat_ = y_upd[1] - c.prev_lat
        a_h = (
            jnp.sin(dlat_ / 2.0) ** 2
            + jnp.cos(c.prev_lat) * jnp.cos(y_upd[1]) * jnp.sin(dlon / 2.0) ** 2
        )
        ddis = jnp.abs(2.0 * jnp.arctan2(jnp.sqrt(a_h), jnp.sqrt(1.0 - a_h)))
        kill = (jnp.abs(y_upd[1]) >= 0.5 * pi) | (ddis >= cut_off)
        y_sav = jnp.where((crossing & kill)[None, :], jnp.nan, y_upd)
        y_out = jnp.where(crossing[None, :], y_sav, y_upd)
        # The crossing state IS the 7th-stage state, so (ug_new, vg_new) are
        # the output group velocities; kill-masked like the state.
        gv_sav = jnp.where((crossing & kill)[None, :], jnp.nan,
                           jnp.stack([ug_new, vg_new]))
        row_sav = jnp.concatenate([y_sav, gv_sav], axis=0)  # (7, R)

        # Record the saved state into this ray's current bound slot.
        sel = crossing[None, :] & (
            jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0) == c.idx[None, :]
        )[:, None, :].reshape(g, 1, r)
        hist_out = jnp.where(sel, row_sav[None], c.hist)

        # Dead after crossing -> skip all remaining bounds (their slots stay
        # NaN, exactly like the barrier version's NaN propagation).
        dead_after = crossing & jnp.isnan(y_sav[0])
        idx_out = jnp.where(
            dead_after, g, jnp.where(crossing, c.idx + 1, c.idx)
        ).astype(jnp.int32)

        f_out = jnp.where(upd[None, :], f_new, c.f)
        h_out = jnp.where(act, h_next, c.h)
        rejected_out = jnp.where(act & ~frozen, ~accept, c.rejected)
        new_step_out = jnp.where(act & ~frozen, accept, c.new_step)
        prev_lon_out = jnp.where(crossing, y_sav[0], c.prev_lon)
        prev_lat_out = jnp.where(crossing, y_sav[1], c.prev_lat)

        return _GroupCarry(
            y=y_out, t=t_out, h=h_out, f=f_out,
            rejected=rejected_out, new_step=new_step_out,
            idx=idx_out, hist=hist_out,
            prev_lon=prev_lon_out, prev_lat=prev_lat_out,
            iters=c.iters + 1, nfev=c.nfev + 6,
            lane_att=c.lane_att + (act & ~frozen).astype(jnp.int32),
        )

    out = jax.lax.while_loop(cond, body, carry)
    return (out.hist, out.y, out.t, out.h, out.f, out.prev_lon,
            out.prev_lat, out.iters, out.nfev, out.lane_att,
            out.rejected, out.new_step, out.idx)


class _DenseCarry(NamedTuple):
    y: jnp.ndarray         # (5, R)
    t: jnp.ndarray         # (R,)
    h: jnp.ndarray         # (R,)
    f: jnp.ndarray         # (5, R) FSAL carry
    rejected: jnp.ndarray  # (R,) bool
    new_step: jnp.ndarray  # (R,) bool
    hist: jnp.ndarray      # (G, 5, R) interpolated states at the bounds
    iters: jnp.ndarray
    nfev: jnp.ndarray
    lane_att: jnp.ndarray  # (R,) int32


def integrate_group_dense(
    rhs_fn, y, t, h, f, bounds, rtol, atol, min_step,
    max_iters=1_000_000, state0=None,
    pin_limit=None, pin_mwn=None, pin_row: int = 3,
):
    """Free-stepping integration over a group of bounds with DENSE OUTPUT.

    The exact path (``integrate_group``) clamps every step at every output
    bound, which pins the error-controlled step of ~95% of lanes at the
    2-hour output cadence: measured on the north-star workload, the median
    lane's error-limited step is 14 h, so the clamp costs it ~4.5x the
    attempts physics requires. Here each lane steps freely (clamped only at
    the FINAL bound, the chunk boundary) and output states at intermediate
    bounds are evaluated from the Dormand-Prince quartic dense-output
    interpolant (``DP_P``) of whichever accepted step spans them -- the
    standard scipy ``solve_ivp(..., t_eval=...)`` treatment, locally
    O(h^5)-accurate like the integration itself.

    DELIBERATELY NOT bit-identical to the clamped path (the step sequence
    differs); tolerance-level agreement is gated by tests. Kill masks and
    per-bound (ug, vg) are NOT applied here -- the caller post-passes them
    over the emitted history (tracer._dense_postpass), which is exact
    because a kill at bound j only affects output at bounds >= j and the
    killed lane's extra integration is discarded.

    Args/returns mirror ``integrate_group`` minus prev_lon/prev_lat (kills
    are the caller's post-pass): returns
    (hist (G, 5, R), y, t, h, f, iters, nfev, lane_attempts) where y/t are
    the INTEGRATED chunk-end state (history interpolation introduces no
    error into the continuation).

    SUSPEND/RESUME (the peel scheduler's primitive): the loop stops once
    ``iters`` reaches ``max_iters`` (may be a traced scalar); the returned
    (y, t, h, f) plus ``state0``-shaped (hist, rejected, new_step,
    lane_attempts) are a complete mid-chunk snapshot. Passing them back via
    ``state0`` (possibly gathered to a lane SUBSET -- every per-lane
    quantity is independent) continues the integration bitwise-exactly;
    lanes with t == bounds[-1] re-enter as finished no-ops.

    STRAGGLER PIN-KILL (``pin_limit``/``pin_mwn``/``pin_row``): a lane
    approaching a critical layer (Ks -> zwn, u -> 0) has |l| -> inf and
    group speed -> 0; the reference retires it only at |l| >= 100
    (reference wr.py:509) after grinding thousands of error-controlled
    near-floor steps (the late-run straggler tail that dominates the
    day-20..30 wall; measured ~7000 attempts per 60-bound chunk vs a
    lane-median of ~10). When enabled, a lane whose per-chunk step-attempt
    count ``lane_att`` (the cost signal the peel/bucketed schedulers
    already track; resets at chunk entry, travels through suspend/resume)
    reaches ``pin_limit`` while |y[pin_row]| >= ``pin_mwn`` is NaN-retired
    through the ordinary kill path -- the same death the |m| cap would
    impose, detected from its precursor (cost explosion + runaway
    wavenumber) instead of the cap crossing. Retirement fires on accepted
    steps and (round 5) on rejected attempts at/below the step floor, so
    a perpetual-rejection grinder -- a lane whose trial error never drops
    below 1 as h collapses, which never produces an accepted step at all
    (measured: benchmarks/r4_results/multichip_skew_pin500m0.json) --
    cannot evade the budget. Bounds crossed by already-accepted steps
    keep their emitted samples; later bounds stay NaN exactly like a
    natural mid-chunk death. Disabled (both None, the default) the check
    rides a never-firing sentinel and results are bitwise-identical to
    the pre-knob code.
    """
    g = bounds.shape[0]
    r = t.shape[0]
    t_end = bounds[-1]
    if pin_limit is None:
        # Sentinel that can never fire: the counter stays below 2**30 for
        # any real chunk (max_iters bounds it), so the OFF path costs a few
        # dead elementwise ops and nothing else.
        pin_limit = jnp.asarray(2 ** 30, jnp.int32)
        pin_mwn = jnp.asarray(jnp.inf, y.dtype)
    if state0 is None:
        (hist0, rejected0, new_step0, lane_att0,
         t_shift) = dense_entry_state(y, bounds)
        t0 = jnp.where(jnp.isnan(t_shift), t, t_shift)
    else:
        hist0, rejected0, new_step0, lane_att0 = state0
        t0 = t

    carry = _DenseCarry(
        y=y, t=t0, h=h, f=f,
        rejected=rejected0,
        new_step=new_step0,
        hist=hist0,
        iters=jnp.zeros((), jnp.int32),
        nfev=jnp.zeros((), jnp.int32),
        lane_att=lane_att0,
    )

    def cond(c: _DenseCarry):
        return jnp.any(c.t < t_end) & (c.iters < max_iters)

    def body(c: _DenseCarry) -> _DenseCarry:
        act = c.t < t_end

        f0 = c.f
        heff = jnp.where(c.new_step, jnp.maximum(c.h, min_step), c.h)
        t_new = jnp.minimum(c.t + heff, t_end)
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

        # NaN handling differs from the exact path BY NECESSITY: free steps
        # are up to ~20x larger, so trial stages routinely probe beyond the
        # valid domain (past the pole, |l|>=100) and NaN the evaluation even
        # though the lane is perfectly healthy -- the exact path's
        # NaN-error-counts-as-accept convention (reference rkf45.py:446,
        # tolerable there because clamped steps rarely overshoot) would kill
        # such lanes spuriously. Here a NaN error REJECTS at the maximum
        # shrink factor and retries; only a lane that still NaNs at the step
        # floor (or whose state is already NaN) accepts the NaN and dies,
        # preserving the genuine-divergence kill.
        nan_err = jnp.isnan(error_norm)
        dead_now = jnp.isnan(c.y[0])
        at_floor = hstep <= min_step
        accept = jnp.where(
            nan_err, dead_now | at_floor, error_norm < 1.0)
        raw = SAFETY * error_norm ** ERROR_EXPONENT
        fac_acc = jnp.minimum(MAX_FACTOR, raw)
        fac_acc = jnp.where(c.rejected, jnp.minimum(1.0, fac_acc), fac_acc)
        fac_acc = jnp.where(nan_err, 1.0, fac_acc)
        fac_rej = jnp.maximum(MIN_FACTOR, raw)
        fac_rej = jnp.where(nan_err, MIN_FACTOR, fac_rej)
        h_next = jnp.where(accept, hstep * fac_acc, hstep * fac_rej)

        upd = act & accept

        # Dense emission: every bound spanned by this accepted step gets the
        # quartic interpolant of its stages (theta in (0, 1]).
        crossed = (
            upd[None, :]
            & (bounds[:, None] > c.t[None, :])
            & (bounds[:, None] <= t_new[None, :])
        )
        th = (bounds[:, None] - c.t[None, :]) / jnp.where(
            hstep == 0, 1.0, hstep)[None, :]
        bp = [
            th * (p0 + th * (p1 + th * (p2 + th * p3)))
            for (p0, p1, p2, p3) in DP_P
        ]
        y_interp = c.y[None] + hstep[None, None, :] * sum(
            bp[i][:, None, :] * k[i][None] for i in range(7)
        )
        hist_out = jnp.where(crossed[:, None, :], y_interp, c.hist)

        t_out = jnp.where(upd, t_new, c.t)
        y_out = jnp.where(upd[None, :], y_new, c.y)

        # Straggler pin-kill (see docstring): per-chunk attempt count
        # (lane_att, the schedulers' existing cost signal) past pin_limit
        # while the wavenumber is past pin_mwn. Fires on ACCEPTED steps
        # (so the emitted samples of the retiring step stay intact) AND --
        # round 5 -- on REJECTED attempts at/below the step floor: a
        # PERPETUAL-REJECTION grinder (trial error never < 1 as h
        # collapses; measured round 4 at north-star scale, one 8-shard
        # chunk = 1,001,209 loop trips / 2.14 M attempts on one shard,
        # benchmarks/r4_results/multichip_skew_pin500m0.json) never
        # completes an accepted step, so an accept-only gate cannot retire
        # it and the whole mesh pays its grind to the max_iters backstop.
        # `hstep <= min_step` is the grinder signature: persistent
        # rejection decays h below the floor within ~a dozen trips (heff
        # only re-floors on new_step), while a healthy rejecting lane's h
        # sits far above it -- so the arm cannot fire on ordinary
        # rejections. NaN-ing BEFORE the dead-lane sweep below routes
        # retirement through the ordinary kill path (t -> t_end,
        # un-emitted bounds stay NaN). OFF (sentinel thresholds) remains
        # bitwise-identical: both arms are gated on lane_att >= 2**30.
        lane_att_out = c.lane_att + act.astype(jnp.int32)
        floor_rej = act & ~accept & (hstep <= min_step * (1 + 1e-6))
        retire = ((upd | floor_rej) & (lane_att_out >= pin_limit)
                  & (jnp.abs(y_out[pin_row]) >= pin_mwn))
        y_out = jnp.where(retire[None, :], jnp.nan, y_out)

        # Lanes whose state went NaN (polar/runaway inside the RHS) finish
        # immediately; their un-emitted bounds stay NaN.
        t_out = jnp.where(act & jnp.isnan(y_out[0]), t_end, t_out)
        f_out = jnp.where(upd[None, :], f_new, c.f)
        h_out = jnp.where(act, h_next, c.h)
        rejected_out = jnp.where(act, ~accept, c.rejected)
        new_step_out = jnp.where(act, accept, c.new_step)

        return _DenseCarry(
            y=y_out, t=t_out, h=h_out, f=f_out,
            rejected=rejected_out, new_step=new_step_out,
            hist=hist_out,
            iters=c.iters + 1, nfev=c.nfev + 6,
            lane_att=lane_att_out,
        )

    out = jax.lax.while_loop(cond, body, carry)
    return (out.hist, out.y, out.t, out.h, out.f, out.iters, out.nfev,
            out.lane_att, out.rejected, out.new_step)
