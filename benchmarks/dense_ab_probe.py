"""Paired A/B probe: exact vs dense+peel per-iteration cost vs chunk G.

The axon worker's health drifts on the ~hour scale, so cross-process bench
numbers can't attribute a 15% delta. This probe times all variants in ONE
process, seconds apart: exact chunk (G=60), dense+peel at G=60/20/12.
Hypothesis under test: the dense body's full-(G,5,R) interpolant + hist
select costs O(G*R) per iteration, so shrinking G recovers the peel win
(lane-iteration units already measured 2.8x lower than exact).

Run on the TPU (device time ~5 s total, under the worker's fault budget):
  python benchmarks/dense_ab_probe.py
"""

import os
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ.get("BENCH_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    import rwrt_tpu as rt
    from rwrt_tpu import tracer
    from rwrt_tpu.models import ray as ray_mod
    from rwrt_tpu.solvers import rk45 as rk45_mod
    from bench import climatology_background

    dtype = "float32"
    tstep = 7200.0
    days = float(os.environ.get("AB_DAYS", "5"))
    nt = int(days * 86400.0 / tstep) + 1

    nsource = int(os.environ.get("AB_NSOURCE", "4800"))
    nzwn = 7
    u, v, lat, lon = climatology_background()
    bs = rt.prepare(u, v, lat, lon, cal_dtype=dtype)
    bg = tracer.make_background(bs, freq=0.0)

    rng = np.random.default_rng(0)
    slon = jnp.asarray(rng.uniform(0, 2 * np.pi, nsource), dtype)
    slat = jnp.asarray(
        rng.uniform(np.radians(-65), np.radians(65), nsource), dtype)
    zwn = jnp.asarray(np.arange(1, nzwn + 1, dtype=np.float64), dtype)
    y0, _, _ = tracer.initialize(bg, slon, slat, zwn)
    idx = tracer.compact_lane_indices(np.isfinite(np.asarray(y0[4])))
    if idx is not None:
        y0 = jnp.take(y0, jnp.asarray(idx), axis=1)
    n_lanes = y0.shape[1]

    rtol = rk45_mod.validate_tol(jnp.asarray(1e-6, dtype), dtype)
    atol = jnp.asarray(1e-6, dtype)
    min_step = jnp.asarray(1e-3 * tstep, dtype)
    dt = jnp.asarray(tstep, dtype)
    cut_off = jnp.asarray(0.2, dtype)
    h0 = tracer.initial_step_sizes(bg, y0, rtol, atol)
    t0v = jnp.zeros(n_lanes, dtype)
    f0, _ = ray_mod.rhs(bg, y0)

    def sync(x):
        return float(np.asarray(jnp.nansum(jnp.ravel(x)[:128])))

    def run(mode, chunk):
        carry = (y0, t0v, h0, f0, y0[0], y0[1])
        units = 0
        step = 1
        t_start = time.perf_counter()
        while step < nt:
            n = min(chunk, nt - step)
            bounds = jnp.arange(step, step + n, dtype=dtype) * dt
            if mode == "exact":
                carry, (_, _, _, iters, _, _la) = tracer._rk45_group_chunk(
                    bg, *carry, bounds, cut_off, rtol, atol, min_step)
                units += int(np.asarray(iters)) * n_lanes
            else:
                carry, (_, _, _, iters, _, _la) = (
                    tracer._rk45_group_chunk_dense_peeled(
                        bg, *carry, bounds, cut_off, rtol, atol, min_step,
                        caps=(24, 96), min_width=2048))
                units += int(np.asarray(iters))
            sync(carry[0])
            step += n
        wall = time.perf_counter() - t_start
        return wall, units

    # Warm all programs with a tiny 2-bound run first (compile cache), then
    # time. Order alternates to expose any worker drift inside the probe.
    plans = [("exact", 60), ("peel", 60), ("peel", 20), ("peel", 12),
             ("exact", 60), ("peel", 20)]
    results = []
    for mode, chunk in plans:
        wall, units = run(mode, chunk)
        per_unit = wall / max(units, 1)
        results.append((mode, chunk, wall, units, per_unit))
        print(f"{mode:5s} G={chunk:3d}: wall={wall:7.3f} s  "
              f"units={units/1e6:7.2f} M  {per_unit*1e9:7.2f} ns/unit",
              flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
