"""Characterize step-floor-pinned straggler lanes on the bench workload.

VERDICT r3 item 2 asks for PHYSICAL retirement of straggler lanes (the
scheduler only works around them). Before choosing a retirement criterion
this probe answers, with data from the actual workload:

  1. which lanes are pinned (per-chunk lane_attempts from the peeled dense
     scheduler -- the same accounting the bench runs);
  2. what a pinned lane looks like physically: h vs the step floor, |l|,
     lat, per-chunk displacement at the output cadence;
  3. whether pinned lanes RECOVER (h regrows, attempts drop back to the
     bulk) or are on a one-way grind to the |l| >= mwn_cap kill -- the
     difference between a safe early-retirement rule and a lossy one;
  4. how far from the |l|=100 cap the grind happens and how long it lasts
     (in output steps), i.e. how much wall a retirement rule can recover.

Writes benchmarks/r4_results/straggler_probe.npz with per-chunk per-lane
(attempts, h, t, lat, l, alive) plus the chunk walls, and prints a summary.

Usage: python benchmarks/straggler_probe.py    (TPU; ~1-2 min device)
  env: PROBE_NSOURCE (default 1200), PROBE_DAYS (default 30),
       PROBE_CHUNK (default 60 bounds), PROBE_CPU=1 for a CPU run
       (smaller PROBE_NSOURCE recommended there).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROBE_CPU") == "1":
    # The ambient sitecustomize pins the axon TPU plugin regardless of
    # JAX_PLATFORMS; re-override via jax.config (tests/conftest.py dance)
    # for a CPU run that never touches the tunnel.
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "BENCH_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

import rwrt_tpu as rt  # noqa: E402
from rwrt_tpu import tracer  # noqa: E402
from rwrt_tpu.models import ray as ray_mod  # noqa: E402
from rwrt_tpu.solvers import rk45 as rk45_mod  # noqa: E402

from bench import climatology_background  # noqa: E402  (bench background)


def main():
    nsource = int(os.environ.get("PROBE_NSOURCE", "1200"))
    days = float(os.environ.get("PROBE_DAYS", "30"))
    chunk = int(os.environ.get("PROBE_CHUNK", "60"))
    dtype = "float32"
    tstep = 7200.0
    nt_m1 = int(days * 86400.0 / tstep)

    u, v, lat, lon = climatology_background()
    bs = rt.prepare(u, v, lat, lon, cal_dtype=dtype)
    bg = tracer.make_background(bs, freq=0.0)

    rng = np.random.default_rng(0)
    slon = jnp.asarray(rng.uniform(0, 2 * np.pi, nsource), dtype)
    slat = jnp.asarray(
        rng.uniform(np.radians(-65), np.radians(65), nsource), dtype)
    zwn = jnp.asarray(np.arange(1, 8, dtype=np.float64), dtype)
    y0, _, _ = tracer.initialize(bg, slon, slat, zwn)
    idx = tracer.compact_lane_indices(np.isfinite(np.asarray(y0[4])))
    if idx is not None:
        y0 = jnp.take(y0, jnp.asarray(idx), axis=1)
    n_lanes = y0.shape[1]

    rtol = rk45_mod.validate_tol(jnp.asarray(1e-6, dtype), dtype)
    atol = jnp.asarray(1e-6, dtype)
    min_step = jnp.asarray(1e-3 * tstep, dtype)
    dt = jnp.asarray(tstep, dtype)
    cut_off = jnp.asarray(0.1 * tstep / 3600.0, dtype)

    h0 = tracer.initial_step_sizes(bg, y0, rtol, atol)
    f0, _ = ray_mod.rhs(bg, y0)
    carry = (y0, jnp.zeros(n_lanes, dtype), h0, f0, y0[0], y0[1])

    recs = {k: [] for k in ("att", "h", "t", "lat", "l", "lon", "alive")}
    walls = []
    step = 1
    while step <= nt_m1:
        n = min(chunk, nt_m1 - step + 1)
        bounds = jnp.arange(step, step + n, dtype=dtype) * dt
        t0 = time.perf_counter()
        carry, (_ys, _ugs, _vgs, units, _nfev, la) = (
            tracer._rk45_group_chunk_dense_peeled(
                bg, *carry, bounds, cut_off, rtol, atol, min_step,
                min_width=int(os.environ.get("PROBE_MINW", "2048")),
                cap_ceiling=2048))
        y_c, t_c, h_c = carry[0], carry[1], carry[2]
        la_h = np.asarray(la)
        walls.append(time.perf_counter() - t0)
        recs["att"].append(la_h)
        recs["h"].append(np.asarray(h_c))
        recs["t"].append(np.asarray(t_c))
        recs["lat"].append(np.asarray(y_c[1]))
        recs["l"].append(np.asarray(y_c[3]))
        recs["lon"].append(np.asarray(y_c[0]))
        recs["alive"].append(np.isfinite(np.asarray(y_c[0])))
        print(f"# chunk [{step},{step + n}) wall={walls[-1]:.3f}s "
              f"units={int(units)} att_p50={np.percentile(la_h, 50):.0f} "
              f"p99={np.percentile(la_h, 99):.0f} max={la_h.max()}",
              flush=True)
        step += n
        # Incremental snapshot: a killed/crashed probe keeps every chunk
        # measured so far (XLA CPU compiles alone can cost ~1 h here).
        _snap = {k: np.stack(v) for k, v in recs.items()}
        _out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            os.environ.get("PROBE_RESULTS", "r4_results"),
                            "straggler_probe"
                            + ("_cpu" if os.environ.get("PROBE_CPU") == "1"
                               else "") + ".npz")
        os.makedirs(os.path.dirname(_out), exist_ok=True)
        np.savez(_out, walls=np.asarray(walls), min_step=float(min_step),
                 n_lanes=n_lanes, **_snap)

    arrs = {k: np.stack(v) for k, v in recs.items()}
    suffix = "_cpu" if os.environ.get("PROBE_CPU") == "1" else ""
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.environ.get("PROBE_RESULTS", "r4_results"),
                       f"straggler_probe{suffix}.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, walls=np.asarray(walls), min_step=float(min_step),
             n_lanes=n_lanes, **arrs)

    # --- summary ---------------------------------------------------------
    att = arrs["att"]          # (n_chunks, n_lanes) attempts within chunk
    h = arrs["h"]
    lam = np.abs(arrs["l"])
    alive = arrs["alive"]
    n_chunks = att.shape[0]
    floor = float(min_step) * 1.001
    summary = {"n_lanes": int(n_lanes), "n_chunks": int(n_chunks),
               "walls": [round(w, 3) for w in walls]}
    # pinned per chunk: h at floor at chunk end among alive lanes
    pinned = (h <= floor) & alive
    summary["pinned_per_chunk"] = pinned.sum(axis=1).tolist()
    summary["dead_per_chunk"] = (~alive).sum(axis=1).tolist()
    # attempts concentration: share of total attempts from top 1% lanes
    tot = att.sum(axis=1).astype(float)
    k = max(1, n_lanes // 100)
    top = np.sort(att, axis=1)[:, -k:].sum(axis=1)
    summary["top1pct_attempt_share"] = [
        round(float(a / b), 3) if b else 0.0 for a, b in zip(top, tot)]
    # recovery analysis: lanes pinned at chunk c -- alive and unpinned later?
    rec_rows = []
    for c in range(n_chunks - 1):
        p = np.where(pinned[c])[0]
        if not len(p):
            rec_rows.append({"chunk": c, "pinned": 0})
            continue
        later_alive = alive[-1][p]
        later_unpinned = ((h[c + 1:, p] > floor) & alive[c + 1:, p]).any(axis=0)
        died = ~later_alive
        rec_rows.append({
            "chunk": c, "pinned": int(len(p)),
            "recovered": int((later_unpinned & later_alive).sum()),
            "died_by_end": int(died.sum()),
            "still_pinned_alive_at_end": int(
                (later_alive & ~later_unpinned).sum()),
            "absl_med": round(float(np.median(lam[c][p])), 2),
            "absl_p10": round(float(np.percentile(lam[c][p], 10)), 2),
        })
    summary["pinned_fate"] = rec_rows
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
