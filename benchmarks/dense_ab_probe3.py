"""Probe 3: warm full-run walls for exact vs dense-unpeeled vs dense-peel.

Probe 2 showed the dense while-BODY costs the same per trip as the exact
body (~2.0 ms full-width, interp+select fused for free) and the postpass
is ~58 ms/chunk. This probe answers which of the remaining suspects eats
peel's 2.5x unit win: the unpeeled dense straggler tail (trip count is
the max over lanes) vs peel's own orchestration (host scalar fetches +
narrow-leg floors). Each plan runs twice in one process; the WARM second
wall is reported, with peel per-leg telemetry.

Run on the TPU:  python benchmarks/dense_ab_probe3.py
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

    def run(mode, chunk):
        carry = carry0
        trips = 0
        step = 1
        while step < nt:
            n = min(chunk, nt - step)
            bounds = jnp.arange(step, step + n, dtype=dtype) * dt
            if mode == "exact":
                carry, aux = tracer._rk45_group_chunk(
                    bg, *carry, bounds, cut_off, rtol, atol, min_step)
                trips += int(np.asarray(aux[3]))
            elif mode == "dense":
                carry, aux = tracer._rk45_group_chunk_dense(
                    bg, *carry, bounds, cut_off, rtol, atol, min_step)
                trips += int(np.asarray(aux[3]))
            else:
                carry, aux = tracer._rk45_group_chunk_dense_peeled(
                    bg, *carry, bounds, cut_off, rtol, atol, min_step,
                    caps=(24, 96), min_width=2048)
                trips += int(np.asarray(aux[3]))  # lane-units for peel
            sync(carry[0])
            step += n
        return trips

    for mode, chunk in (("exact", 60), ("dense", 60), ("peel", 60),
                        ("dense", 20), ("peel", 20)):
        run(mode, chunk)  # warm
        t0 = time.perf_counter()
        trips = run(mode, chunk)
        wall = time.perf_counter() - t0
        unit = ("lane-units" if mode == "peel" else "trips")
        print(f"{mode:5s} G={chunk:3d}: warm wall={wall:7.3f} s  "
              f"{unit}={trips}", flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
