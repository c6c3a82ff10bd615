"""Precision/bound-mode cost + accuracy measurement (VERDICT r2 items 2+3).

Two knobs are measured together because they share the same harness and the
same oracle:

* ``RunConfig.state_dtype='float64'`` (DESIGN.md section 7) integrates a
  float64 state/controller over the float32 background-sample/RHS path,
  built to buy back the 30-day f32 drift. What does that MODE cost and buy?
* ``bound_mode`` dense vs exact (DESIGN.md sections 6d/6e): dense-output
  free stepping vs the reference's bound-clamped stepping
  (/root/reference/wr.py:808-830). The full-scale 30-day walls come from
  bench.py's span ladder (BENCH_DENSE=0/1, see MEASUREMENTS.md); this probe
  supplies the matching ACCURACY column.

Legs:

  rate       full bench lane count (60,792 after rootless compaction),
             5 model days, peel-scheduled chunks, warm in-process walls:
             f32-dense vs f32-exact vs mixed (f64 state over f32 sampling,
             dense) vs full f64 (cal_dtype float64 end to end, dense).

  accuracy   nsource=200 (4,200 lanes, compacted), 30 model days on the
             device in each mode, against the full-f64 oracle ON CPU
             (the dtype whose 30-day whole-batch RMSE vs the reference
             is gated <0.1 deg by tests/test_trajectories.py). Reports
             day-10 position RMSE and day-30 median per-sample drift --
             the decomposed gate of tests/test_precision.py (beyond the
             ~8-day e-folding horizon a flat RMSE measures chaos, not
             solver quality).

Run on the TPU (single client -- see MEASUREMENTS.md protocol):
    JAX_ENABLE_X64=1 python benchmarks/mixed_precision_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_ENABLE_X64", "1")


def _positions(ys):
    """(nt, 2, R) lon/lat in degrees from a raw (nt, 5, R) state history."""
    lon = np.degrees(np.asarray(ys[:, 0], np.float64))
    lat = np.degrees(np.asarray(ys[:, 1], np.float64))
    return lon, lat


def _errs(lon_a, lat_a, lon_b, lat_b, it):
    """Per-lane small-separation position error (deg) at output step it."""
    dlat = lat_a[it] - lat_b[it]
    dlon = (lon_a[it] - lon_b[it] + 180.0) % 360.0 - 180.0
    coslat = np.cos(np.radians(lat_b[it]))
    err = np.sqrt(dlat**2 + (dlon * coslat) ** 2)
    both = np.isfinite(lat_a[it]) & np.isfinite(lat_b[it])
    return err[both]


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", os.environ.get("BENCH_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp

    import rwrt_tpu as rt
    from rwrt_tpu import tracer
    from rwrt_tpu.models import ray as ray_mod
    from rwrt_tpu.solvers import rk45 as rk45_mod
    from bench import climatology_background

    tstep = 7200.0
    u, v, lat, lon = climatology_background()

    def build(nsource, dtype, state_dtype, seed=0):
        bs = rt.prepare(u, v, lat, lon, cal_dtype=dtype)
        bg = tracer.make_background(bs, freq=0.0)
        rng = np.random.default_rng(seed)
        slon = jnp.asarray(rng.uniform(0, 2 * np.pi, nsource), dtype)
        slat = jnp.asarray(
            rng.uniform(np.radians(-65), np.radians(65), nsource), dtype)
        zwn = jnp.asarray(np.arange(1, 8, dtype=np.float64), dtype)
        y0, _, _ = tracer.initialize(bg, slon, slat, zwn)
        idx = tracer.compact_lane_indices(np.isfinite(np.asarray(y0[4])))
        if idx is not None:
            y0 = jnp.take(y0, jnp.asarray(idx), axis=1)
        if state_dtype == "float64":
            y0 = y0.astype(jnp.float64)
        sd = y0.dtype
        rtol = rk45_mod.validate_tol(jnp.asarray(1e-6, sd), str(sd))
        atol = jnp.asarray(1e-6, sd)
        min_step = jnp.asarray(1e-3 * tstep, sd)
        dt = jnp.asarray(tstep, sd)
        cut_off = jnp.asarray(0.1 * tstep / 3600.0, sd)
        h0 = tracer.initial_step_sizes(bg, y0, rtol, atol)
        f0, _ = ray_mod.rhs(bg, y0)
        return bg, y0, h0, f0, dt, cut_off, rtol, atol, min_step

    def run(bg, y0, h0, f0, dt, cut_off, rtol, atol, min_step, nt,
            chunk=60, keep_history=False, bound_mode="dense"):
        """Peel-scheduled chunked run (the bench path); (wall, ys?)."""
        chunk_fn = (tracer._rk45_group_chunk_dense_peeled
                    if bound_mode == "dense"
                    else tracer._rk45_group_chunk_peeled)
        sd = y0.dtype
        t0v = jnp.zeros(y0.shape[1], sd)
        carry = (y0, t0v, h0, f0, y0[0], y0[1])
        hist = [] if keep_history else None
        t_start = time.perf_counter()
        step = 1
        while step < nt:
            n = min(chunk, nt - step)
            t_bounds = jnp.arange(step, step + n, dtype=sd) * dt
            carry, (ys, ugs, vgs, iters, nfev, _la) = chunk_fn(
                bg, *carry, t_bounds, cut_off, rtol, atol, min_step)
            if keep_history:
                hist.append(np.asarray(ys))
            else:
                float(np.asarray(jnp.nansum(jnp.ravel(carry[0])[:64])))
            step += n
        wall = time.perf_counter() - t_start
        if keep_history:
            return wall, np.concatenate(hist, axis=0)
        return wall, None

    day_steps = int(86400.0 / tstep)

    if os.environ.get("PROBE_ORACLE") == "1":
        # CPU-subprocess mode: write the f64 oracle histories (one per
        # bound mode, so each device row is judged against its own mode's
        # converged-dtype answer and the dtype error is not conflated with
        # the dense-vs-exact mode difference) and exit.
        nt30 = 30 * day_steps + 1
        args = build(200, "float64", "compute", seed=7)
        _, ys_dense = run(*args, nt30, keep_history=True,
                          bound_mode="dense")
        _, ys_exact = run(*args, nt30, keep_history=True,
                          bound_mode="exact")
        np.savez(os.environ["PROBE_ORACLE_PATH"], ys=ys_dense,
                 ys_exact=ys_exact)
        print("# oracle written", flush=True)
        return

    # Incremental progress record: the campaign's 1800 s window is shorter
    # than a cold full run (observed: attempt 1 timed out mid-accuracy-leg),
    # so each measured leg persists immediately and later attempts skip it.
    import json

    ck_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          os.environ.get("PROBE_RESULTS", "r5_results"))
    os.makedirs(ck_dir, exist_ok=True)
    ck_path = os.path.join(ck_dir, "mp_progress.json")
    try:
        with open(ck_path) as fh:
            ck = json.load(fh)
    except (OSError, ValueError):
        ck = {"rates": {}, "acc": {}}

    def _ck_save():
        tmp = ck_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(ck, fh)
        os.replace(tmp, ck_path)

    # ---- rate leg: full lane count, 5 days, warm second wall ------------
    nt5 = 5 * day_steps + 1
    print("# rate leg: 60k lanes x 5 days, peel scheduling, warm walls")
    rates = {}
    legs = (("f32-dense", "float32", "compute", "dense"),
            ("f32-exact", "float32", "compute", "exact"),
            ("mixed", "float32", "float64", "dense"),
            ("f64", "float64", "compute", "dense"))
    for label, dtype, sdt, bm in legs:
        if label in ck["rates"]:
            wall, n_lanes = ck["rates"][label]
            rates[label] = wall
        else:
            args = build(4800, dtype, sdt)
            run(*args, nt5, bound_mode=bm)  # compile + warm
            wall, _ = run(*args, nt5, bound_mode=bm)
            n_lanes = args[1].shape[1]
            rates[label] = wall
            ck["rates"][label] = [wall, n_lanes]
            _ck_save()
        rate = n_lanes * (nt5 - 1) / wall
        print(f"{label:10s} wall={wall:7.3f} s  lane-steps/s={rate:12.0f}  "
              f"x_vs_f32={rates['f32-dense'] / wall:5.2f}", flush=True)

    # ---- accuracy leg: 4.2k lanes, 30 days, vs CPU f64 oracle ------------
    nt30 = 30 * day_steps + 1
    it10 = 10 * day_steps
    print("# accuracy leg: nsource=200 x 30 days vs CPU f64 oracle")
    oracle_path = os.environ.get("PROBE_ORACLE_PATH", "/tmp/mp_oracle.npz")
    if not os.path.exists(oracle_path):
        # The ambient env pins JAX_PLATFORMS to the TPU tunnel; the f64
        # oracle runs on CPU in a subprocess so this process stays the
        # single TPU client.
        import subprocess

        env = dict(os.environ, JAX_PLATFORMS="cpu", PROBE_ORACLE="1",
                   PROBE_ORACLE_PATH=oracle_path)
        subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, check=True)
    with np.load(oracle_path) as st:
        oracle = {"dense": _positions(st["ys"]),
                  "exact": _positions(st["ys_exact"]
                                      if "ys_exact" in st else st["ys"])}
    # The mode difference at f64 (dense free-stepping vs bound-clamped),
    # itself a datum: both satisfy the same tolerances, so this bounds the
    # semantic gap between the two bound modes.
    (ld, bd), (le, be) = oracle["dense"], oracle["exact"]
    m10 = _errs(ld, bd, le, be, it10 - 1)
    print(f"# f64 dense-vs-exact mode gap: day-10 RMSE="
          f"{np.sqrt(np.mean(m10**2)):.2e} deg", flush=True)
    # "mixed" (the VERDICT item-4 row) runs BEFORE "f32-exact": the exact
    # 30-day leg is unpinned and can grind past the probe window on a
    # straggler lane (observed: attempt 2 stalled >17 min in f32-exact),
    # and a missing exact row must not block the mixed one.
    if "f32-exact" not in ck["acc"]:
        # The unpinned EXACT 30-day leg grinds past any probe window on
        # this worker (attempt 2 stalled >22 min inside it with the same
        # seeding that completes in dense mode) -- the same
        # perpetual-rejection straggler class the bench's unpinned A/B row
        # documents (MEASUREMENTS.md round-5 headline). Its accuracy row is
        # skipped rather than measured-with-pin, because a pinned run would
        # NaN-retire lanes the f64 oracle keeps, biasing the error stats.
        ck["acc"]["f32-exact"] = ("f32-exact  SKIPPED: unpinned exact-mode "
                                  "30-day run grinds past the probe window "
                                  "(see MEASUREMENTS.md round-5 headline)")
        _ck_save()
    for label, dtype, sdt, bm in (("f32-dense", "float32", "compute",
                                   "dense"),
                                  ("mixed", "float32", "float64", "dense"),
                                  ("f32-exact", "float32", "compute",
                                   "exact")):
        if label in ck["acc"]:
            print(ck["acc"][label], flush=True)
            continue
        lon_o, lat_o = oracle[bm]
        args = build(200, dtype, sdt, seed=7)
        _, ys = run(*args, nt30, keep_history=True, bound_mode=bm)
        lon_d, lat_d = _positions(ys)
        e10 = _errs(lon_d, lat_d, lon_o, lat_o, it10 - 1)
        e30 = _errs(lon_d, lat_d, lon_o, lat_o, nt30 - 2)
        row = (f"{label:10s} day-10 RMSE={np.sqrt(np.mean(e10**2)):.4f} deg  "
               f"day-30 median drift={np.median(e30):.4f} deg  "
               f"(p90={np.percentile(e30, 90):.3f})")
        ck["acc"][label] = row
        _ck_save()
        print(row, flush=True)


if __name__ == "__main__":
    main()
