"""Hot-loop decomposition profile at full bench scale on the device.

VERDICT r2 item 4: DESIGN section 4's cost model (~80% gather-bound,
~3.7 ns/row) is round-1 vintage; this measures the per-iteration breakdown
of the dense chunk's inner loop AFTER the round-2 changes (corner-packed
single gather, dense bound mode, peel scheduling) so the binding constraint
is re-confirmed (or refuted) on current code.

Measures, at the bench's lane count (60,792 after rootless compaction, or
argv[1]), amortized over fori_loop chains (dispatch excluded):

  gather      corner-packed row gather alone (interp._packed_corner_lerp
              via sample_raw_packed, 48 f32/row)
  sample      gather + Mercator transform
  rhs         full RHS (sample + group velocity + tendencies + masks)
  dp5         one full Dormand-Prince trial step (7 stages FSAL = 6 RHS
              evals + error norm + controller selects) -- the dense-mode
              while-loop body minus the interpolant/bound bookkeeping

It also attempts a jax.profiler trace of one dense chunk (written to
/tmp/rwrt_trace; inspect with xprof/tensorboard where available -- through
the axon tunnel the trace may be empty, in which case the decomposition
above IS the measured breakdown).

Single client at a time on the TPU worker (see MEASUREMENTS.md protocol).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import rwrt_tpu as rt
    from rwrt_tpu import tracer
    from rwrt_tpu.models import ray as ray_mod
    from rwrt_tpu.ops import interp
    from rwrt_tpu.solvers import rk45 as rk45_mod

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ.get("BENCH_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001
        pass

    dtype = "float32"
    n_lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 61440
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    nlon, nlat = 144, 73
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    u = (25.0 * np.cos(lat)[None, :] ** 2
         + 30.0 * np.exp(-(((np.degrees(lat)[None, :] - 35.0) / 12.0) ** 2))
         + 6.0 * np.cos(3 * lon)[:, None] * np.cos(lat)[None, :] ** 2)
    v = 4.0 * np.sin(2 * lon)[:, None] * np.cos(lat)[None, :]
    bs = rt.prepare(u, v, lat, lon, cal_dtype=dtype)
    bg = tracer.make_background(bs, freq=0.0)

    rng = np.random.default_rng(0)
    y = jnp.asarray(np.stack([
        rng.uniform(0, 2 * np.pi, n_lanes),
        rng.uniform(-1.1, 1.1, n_lanes),
        rng.uniform(1.0, 7.0, n_lanes),   # zonal wavenumber
        rng.uniform(-5.0, 5.0, n_lanes),  # meridional wavenumber
        np.ones(n_lanes),
    ]), dtype)

    def sync(x):
        return float(np.asarray(jnp.nansum(jnp.ravel(x)[:64])))

    # --- timed chains ------------------------------------------------------
    # Per-eval costs are measured as the DELTA between loop bodies holding
    # m_hi vs m_lo chained evals (same loop trip count): a body with a
    # SINGLE eval is not representative -- XLA's fusion choices for the
    # 12-consumer background gather degrade pathologically there (measured
    # 2.6 ms/trip for a 1-eval rhs body vs 0.16-0.21 ms/eval in 2- and
    # 6-eval bodies, the production shape -- the dense/exact while bodies
    # always evaluate 6+FSAL stages). The delta cancels both the per-trip
    # loop overhead and that single-eval artifact.
    M_LO, M_HI = 2, 6

    # The gather/sample bodies consume their result with a cheap full-row
    # reduction: slicing two packed columns and transposing (the obvious
    # "use a bit of it" consume) forces a (lanes, 48) relayout that costs
    # MORE than the whole fused RHS and would misattribute that cost to the
    # gather.
    def make_gather_chain(m):
        @jax.jit
        def chain(bg, y, n):
            def body(i, acc):
                for _ in range(m):
                    raw = interp.sample_raw_packed(
                        bg.fields, bg.lon0, bg.lat0, bg.dx, bg.dy,
                        y[0] + 1e-9 * acc, y[1])
                    acc = acc + raw.sum(axis=-1)
                return acc
            return jax.lax.fori_loop(0, n, body,
                                     jnp.zeros(n_lanes, y.dtype))
        return chain

    def make_sample_chain(m):
        @jax.jit
        def chain(bg, y, n):
            def body(i, acc):
                for _ in range(m):
                    f = ray_mod.sample_bg(bg, y[0] + 1e-9 * acc, y[1],
                                          0.0)
                    acc = acc + f.sum(axis=0)
                return acc
            return jax.lax.fori_loop(0, n, body, jnp.zeros(n_lanes, y.dtype))
        return chain

    def make_rhs_chain(m):
        @jax.jit
        def chain(bg, y, n):
            def body(i, yy):
                for _ in range(m):
                    dy, _ = ray_mod.rhs(bg, yy)
                    yy = yy + 1e-9 * dy
                return yy
            return jax.lax.fori_loop(0, n, body, y)
        return chain

    h0 = jnp.full(n_lanes, 600.0, dtype)
    rtol = rk45_mod.validate_tol(jnp.asarray(1e-6, dtype), dtype)
    atol = jnp.asarray(1e-6, dtype)

    def rhs_fn(yy, tt=0.0):
        dy, _ = ray_mod.rhs(bg, yy)
        return dy

    f0 = rhs_fn(y)

    @jax.jit
    def dp5_chain(y, f, h, n):
        """Full DP5 trial steps (6 fresh RHS evals + FSAL) chained through
        the controller accept/reject -- the integrate_interval body's
        arithmetic (solvers/rk45.py:160-208) without bound bookkeeping."""
        A, B, C, E = (rk45_mod.DP_A, rk45_mod.DP_B, rk45_mod.DP_C,
                      rk45_mod.DP_E)

        def body(i, carry):
            yy, ff, hh = carry
            k = [ff]
            for s in range(1, 6):
                dy = hh[None, :] * sum(
                    A[s][j] * k[j] for j in range(s) if A[s][j] != 0.0)
                k.append(rhs_fn(yy + dy))
            y_new = yy + hh[None, :] * sum(B[j] * k[j] for j in range(6))
            f_new = rhs_fn(y_new)
            k.append(f_new)
            err = hh[None, :] * sum(E[j] * k[j] for j in range(7))
            scale = atol + jnp.maximum(jnp.abs(yy), jnp.abs(y_new)) * rtol
            en = jnp.sqrt(jnp.sum((err / scale) ** 2, axis=0) / 5.0)
            en = jnp.where(jnp.isnan(en), 0.0, en)
            acc = en < 1.0
            raw = 0.9 * en ** -0.2
            fac = jnp.where(acc, jnp.minimum(10.0, raw),
                            jnp.maximum(0.2, raw))
            hh = jnp.where(jnp.isfinite(hh * fac), hh * fac, hh)
            yy = jnp.where(acc[None], y_new, yy)
            ff = jnp.where(acc[None], f_new, ff)
            return (yy, ff, hh)
        return jax.lax.fori_loop(0, n, body, (y, f, h))

    # Through the axon tunnel every dispatch+fetch pair carries tens of ms
    # of RPC latency with LARGE variance, so single measurements are
    # noise-dominated; each timing below is the MINIMUM of `trials` calls
    # (min is the right estimator for additive positive noise).
    trials = int(os.environ.get("PROFILE_TRIALS", "5"))

    def best_time(fn, n):
        t = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fn(n)
            t = min(t, time.perf_counter() - t0)
        return t

    results = {}
    for name, make in (("gather", make_gather_chain),
                       ("sample", make_sample_chain),
                       ("rhs", make_rhs_chain)):
        fns = {}
        for m in (M_LO, M_HI):
            chain = make(m)
            fns[m] = (lambda n, c=chain: sync(c(bg, y, n)))
            fns[m](1)  # compile + warm
        per = (best_time(fns[M_HI], reps) - best_time(fns[M_LO], reps)) / (
            reps * (M_HI - M_LO))
        results[name] = per
        print(f"{name:8s} {per * 1e3:8.3f} ms/eval  "
              f"{per / n_lanes * 1e9:7.2f} ns/lane", flush=True)

    # dp5 is measured per loop TRIP (its body IS the production shape:
    # 6 fresh RHS evals + FSAL + controller), two trip counts 4x apart.
    dp5_fn = lambda n: sync(dp5_chain(y, f0, h0, n)[0])  # noqa: E731
    dp5_fn(1)
    lo, hi = max(reps // 4, 1), reps
    per_trip = (best_time(dp5_fn, hi) - best_time(dp5_fn, lo)) / (hi - lo)
    results["dp5"] = per_trip
    print(f"{'dp5':8s} {per_trip * 1e3:8.3f} ms/trip  "
          f"{per_trip / n_lanes * 1e9:7.2f} ns/lane", flush=True)

    print(f"\nsample share of RHS: {results['sample'] / results['rhs']:.1%}")
    print(f"gather share of sample: "
          f"{results['gather'] / results['sample']:.1%}")
    print(f"6 RHS evals predict dp5 = {6 * results['rhs'] * 1e3:.3f} ms/trip;"
          f" measured {results['dp5'] * 1e3:.3f} ms/trip "
          f"(controller+norm overhead "
          f"{(results['dp5'] - 6 * results['rhs']) / results['dp5']:.1%})")

    # --- optional: real profiler trace of one dense chunk ------------------
    if os.environ.get("PROFILE_TRACE", "0") == "1":
        t_bounds = jnp.arange(1, 13, dtype=dtype) * jnp.asarray(7200.0, dtype)
        cut_off = jnp.asarray(0.1 * 7200.0 / 3600.0, dtype)
        min_step = jnp.asarray(7.2, dtype)
        tracer._rk45_group_chunk_dense(
            bg, y, jnp.zeros(n_lanes, dtype), h0, f0, y[0], y[1],
            t_bounds, cut_off, rtol, atol, min_step)[1][0].block_until_ready()
        with jax.profiler.trace("/tmp/rwrt_trace"):
            out = tracer._rk45_group_chunk_dense(
                bg, y, jnp.zeros(n_lanes, dtype), h0, f0, y[0], y[1],
                t_bounds, cut_off, rtol, atol, min_step)
            sync(out[1][0])
        print("trace written to /tmp/rwrt_trace")


if __name__ == "__main__":
    main()
