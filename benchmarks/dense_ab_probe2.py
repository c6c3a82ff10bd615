"""Probe 2: localize the dense body's per-iteration overhead.

Times WARM (second call) executions of: exact chunk, unpeeled dense chunk
at G=60/20/8, and the dense postpass alone, reporting per-TRIP cost at
full width. Separates the while-body cost (interp + hist select, O(G*R)
per trip) from peel orchestration and from compile/worker noise.

Run on the TPU:  python benchmarks/dense_ab_probe2.py
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

    nsource = int(os.environ.get("AB_NSOURCE", "4800"))
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
    cut_off = jnp.asarray(0.2, dtype)
    h0 = tracer.initial_step_sizes(bg, y0, rtol, atol)
    t0v = jnp.zeros(n_lanes, dtype)
    f0, _ = ray_mod.rhs(bg, y0)
    carry0 = (y0, t0v, h0, f0, y0[0], y0[1])

    def sync(x):
        return float(np.asarray(jnp.nansum(jnp.ravel(x)[:128])))

    def timed(fn):
        out = fn()
        sync(out[0][0])
        t0 = time.perf_counter()
        out = fn()
        sync(out[0][0])
        return time.perf_counter() - t0, out

    for name, g in (("exact", 60), ("dense", 60), ("dense", 20),
                    ("dense", 8)):
        bounds = jnp.arange(1, 1 + g, dtype=dtype) * dt
        if name == "exact":
            fn = lambda: tracer._rk45_group_chunk(  # noqa: E731
                bg, *carry0, bounds, cut_off, rtol, atol, min_step)
        else:
            fn = lambda: tracer._rk45_group_chunk_dense(  # noqa: E731
                bg, *carry0, bounds, cut_off, rtol, atol, min_step)
        wall, out = timed(fn)
        trips = int(np.asarray(out[1][3]))
        print(f"{name:5s} G={g:3d}: wall={wall:7.3f} s  trips={trips:5d}  "
              f"{wall/trips*1e3:7.3f} ms/trip  "
              f"{wall/trips/n_lanes*1e9:6.1f} ns/lane-trip", flush=True)

    # Postpass alone at G=60 (kill cascade + per-bound gv = G*R gathers).
    g = 60
    bounds = jnp.arange(1, 1 + g, dtype=dtype) * dt
    st = tracer._dense_init_state(y0, bounds)
    nan0 = jnp.isnan(jnp.mean(y0, axis=0))
    zero = jnp.asarray(0, jnp.int32)

    def pp():
        return tracer._dense_postpass_jit(
            bg, st[0], y0, t0v, h0, f0, y0[0], y0[1], bounds, cut_off,
            nan0, zero, zero, st[3])

    wall, _ = timed(pp)
    print(f"postpass G={g}: wall={wall*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
