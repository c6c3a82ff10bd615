"""Per-ray termination accounting.

The reference's failure handling is per-ray masks (SURVEY.md section 5:
latitude out of range wr.py:508, runaway |m| wr.py:509, excessive haversine
displacement wr.py:728-734, polar cap bs.py:858-860) with NaN-fill of dead
rays -- but it records nothing about WHEN or WHY rays died. This module
reconstructs that observability from trajectories.

Two levels:

- ``analyze``: vectorized death-step / survival accounting straight from the
  trajectory arrays (no device work). Cause attribution here is coarse
  (last-live-latitude heuristic) because the saved history does not contain
  the killed candidate state.
- ``classify``: exact-cause reconstruction. Re-integrates ONE output interval
  from each dead ray's last saved state in a single batched device call,
  recovering the candidate state the kill masks actually saw, then applies
  the reference's masks (|lat| >= pi/2, haversine >= cut_off, the |m| >= 100
  runaway NaN) to label each death. Exact for the fixed-step RK4 path (the
  step is stateless); for the adaptive path the re-run starts from a fresh
  per-ray initial step size, which reproduces the same candidate to solver
  tolerance (the controller state h is not in the saved history).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np

from rwrt_tpu.tracer import RayTrajectories


class TerminationReport(NamedTuple):
    """death_step: (3, nsource, nzwn) int; -1 = never born (no root),
    nt = survived to the end. counts maps cause labels to ray counts."""

    death_step: np.ndarray
    alive_frac: np.ndarray   # (nt,) fraction of born rays alive per step
    counts: Dict[str, int]


def death_steps(traj: RayTrajectories, block: int = 64):
    """(death_step, born, alive_per_step): host accounting in time blocks.

    A ray is BORN iff its initial amplitude is finite -- rootless lanes keep
    their (finite) seed position in the history forever because the
    integrator freezes NaN-state lanes without touching them, so finiteness
    of lon would mislabel them as surviving rays.

    The scan runs ``block`` output steps at a time so memmap-backed
    trajectories (``trace_rays_chunked(stream_dir=...)``, whose point is
    host-RAM safety on multi-GB histories) never materialize a full-history
    temporary; in-memory arrays pay nothing for the loop.
    """
    amp = traj.amp if isinstance(traj.amp, np.ndarray) else np.asarray(traj.amp)
    nt = amp.shape[0]
    shape = amp.shape[1:]
    born = np.isfinite(np.asarray(amp[0]))
    first_dead = np.full(shape, nt, dtype=np.int64)
    undead = np.ones(shape, dtype=bool)
    alive_per_step = np.empty(nt, dtype=np.int64)
    for t0 in range(0, nt, block):
        fin = np.isfinite(np.asarray(amp[t0:t0 + block]))
        alive_per_step[t0:t0 + fin.shape[0]] = fin.sum(
            axis=tuple(range(1, fin.ndim)))
        dead = ~fin
        newly = undead & dead.any(axis=0)
        first_dead[newly] = t0 + dead.argmax(axis=0)[newly]
        undead &= ~newly
    return np.where(born, first_dead, -1), born, alive_per_step


def analyze(traj: RayTrajectories) -> TerminationReport:
    """Host-side accounting; coarse causes (see ``classify`` for exact)."""
    lat = traj.lat if isinstance(traj.lat, np.ndarray) else np.asarray(traj.lat)
    nt = lat.shape[0]
    death_step, born, alive_counts = death_steps(traj)

    n_born = max(int(born.sum()), 1)
    alive_frac = alive_counts / n_born

    died = (death_step >= 1) & (death_step < nt)
    # Last live latitude; rays with |lat| near the polar cap at their final
    # saved point almost certainly hit a latitude kill next step. The fancy
    # gather touches one element per ray, so memmaps page in only the rows
    # that contain deaths.
    d = np.clip(death_step, 1, nt - 1)
    ii = np.indices(death_step.shape)
    la_prev = np.asarray(lat[d - 1, ii[0], ii[1], ii[2]])
    near_pole = died & np.isfinite(la_prev) & (np.abs(la_prev) > np.radians(80.0))
    counts = {
        "no_root": int((~born).sum()),
        "survived": int((death_step == nt).sum()),
        "polar": int(near_pole.sum()),
        "unclassified": int((died & ~near_pole).sum()),
    }
    return TerminationReport(
        death_step=death_step, alive_frac=alive_frac, counts=counts
    )


def classify(traj: RayTrajectories, bs, config,
             max_rays: int = 1_000_000) -> TerminationReport:
    """Exact per-ray death causes by re-running the killing interval.

    One batched device call over all dead rays: rebuild each dead ray's last
    saved state, advance one output interval with the configured integrator,
    and apply the reference's kill masks (wr.py:721-734, 508-514) to the
    recovered candidate state. Labels:

      polar    -- candidate latitude left |lat| < pi/2 (wr.py:721-727)
      jump     -- haversine displacement >= cut_off (wr.py:728-734)
      runaway  -- NaN candidate from the RHS err mask, i.e. |m| >= 100 or a
                  mid-stage latitude excursion (wr.py:508-514)
      other    -- death not reproduced by the re-run (adaptive-path h
                  differences; rare)
    """
    import jax
    import jax.numpy as jnp

    from rwrt_tpu.constants import pi
    from rwrt_tpu.models import ray as ray_mod
    from rwrt_tpu.solvers import rk4 as rk4_mod
    from rwrt_tpu.solvers import rk45 as rk45_mod
    from rwrt_tpu import tracer as tracer_mod

    base = analyze(traj)
    death_step = base.death_step
    nt = np.asarray(traj.lon).shape[0]
    died = (death_step >= 1) & (death_step < nt)
    idx = np.argwhere(died)
    counts = dict(base.counts)
    counts.pop("polar", None)
    counts.pop("unclassified", None)
    counts.update({"polar": 0, "jump": 0, "runaway": 0, "other": 0})
    if idx.shape[0] == 0:
        return TerminationReport(death_step, base.alive_frac, counts)
    if idx.shape[0] > max_rays:
        raise ValueError(f"{idx.shape[0]} dead rays exceeds max_rays")

    r_, s_, z_ = idx[:, 0], idx[:, 1], idx[:, 2]
    d = death_step[died]
    dtype = bs.fields.dtype

    def gather(a):
        return np.asarray(a)[d - 1, r_, s_, z_]

    y_prev = jnp.asarray(np.stack([
        gather(traj.lon), gather(traj.lat), gather(traj.kx),
        gather(traj.ky), gather(traj.amp),
    ]), dtype)
    t0 = jnp.asarray((d - 1) * config.tstep, dtype)
    bound = jnp.asarray(d * config.tstep, dtype)
    bg = tracer_mod.make_background(bs, config.freq)
    cut_off = jnp.asarray(config.cut_off_rad, dtype)

    @jax.jit
    def rerun(y, t0, bound):
        if config.integrator == "rk4":
            dt = jnp.asarray(config.tstep, dtype)
            y_new = rk4_mod.rk4_step(bg, y, dt, t0)
        else:
            def rhs_fn(yy, tt=0.0):
                dy, _ = ray_mod.rhs(bg, yy, tt)
                return dy

            rtol = rk45_mod.validate_tol(config.rtol, dtype)
            atol = jnp.asarray(config.atol, dtype)
            min_step = jnp.asarray(
                min(config.min_step_factor * config.tstep,
                    config.tstep * 1e-3), dtype)
            h0 = rk45_mod.select_initial_step(
                rhs_fn, y, rhs_fn(y, t0), rtol, atol, t0)
            y_new, _, _, _, _ = rk45_mod.integrate_interval(
                rhs_fn, y, t0, h0, bound, rtol, atol, min_step,
                max_iters=10_000)
        nan_cand = jnp.isnan(y_new[0]) | jnp.isnan(y_new[3])
        lat_kill = jnp.abs(y_new[1]) >= 0.5 * pi
        ddis = ray_mod.haversine(y_new[0], y_new[1], y[0], y[1])
        jump_kill = ddis >= cut_off
        return nan_cand, lat_kill, jump_kill

    # integrate_interval's t_bound is a traced scalar in the hot path; here
    # every ray carries its own bound, which the per-lane clamp handles.
    nan_cand, lat_kill, jump_kill = map(np.asarray, rerun(y_prev, t0, bound))
    polar = lat_kill & ~nan_cand
    jump = jump_kill & ~nan_cand & ~polar
    runaway = nan_cand
    other = ~(polar | jump | runaway)
    counts["polar"] = int(polar.sum())
    counts["jump"] = int(jump.sum())
    counts["runaway"] = int(runaway.sum())
    counts["other"] = int(other.sum())
    return TerminationReport(death_step, base.alive_frac, counts)
