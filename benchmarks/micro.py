"""Microbenchmarks for the hot path on the attached accelerator.

Times (with scalar-fetch sync, since block_until_ready is a no-op through the
axon tunnel): a single RHS evaluation, one RK4 step, and one adaptive
interval at configurable ray counts. Used to steer kernel optimization.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import rwrt_tpu as rt
    from rwrt_tpu import tracer
    from rwrt_tpu.models import ray as ray_mod
    from rwrt_tpu.solvers import rk4 as rk4_mod

    dtype = "float32"
    u = None
    nlon, nlat = 144, 73
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    u = 25.0 * np.cos(lat)[None, :] ** 2 + 6.0 * np.cos(3 * lon)[:, None] * np.cos(lat)[None, :] ** 2
    v = 4.0 * np.sin(2 * lon)[:, None] * np.cos(lat)[None, :]
    bs = rt.prepare(u, v, lat, lon, cal_dtype=dtype)
    bg = tracer.make_background(bs, 0.0)

    def sync(x):
        return float(np.asarray(jnp.nansum(jnp.ravel(x)[:64])))

    @jax.jit
    def rhs_once(bg, y):
        dy, _ = ray_mod.rhs(bg, y)
        return dy

    @jax.jit
    def rhs_chain(bg, y, n):
        def body(i, y):
            dy, _ = ray_mod.rhs(bg, y)
            return y + 1e-9 * dy

        return jax.lax.fori_loop(0, n, body, y)

    @jax.jit
    def rk4_chain(bg, y, n):
        def body(i, y):
            return rk4_mod.rk4_step(bg, y, jnp.asarray(7200.0, y.dtype))

        return jax.lax.fori_loop(0, n, body, y)

    for n_rays in (8192, 131072):
        rng = np.random.default_rng(0)
        y = jnp.asarray(np.stack([
            rng.uniform(0, 2 * np.pi, n_rays),
            rng.uniform(-1.2, 1.2, n_rays),
            rng.uniform(1, 7, n_rays),
            rng.uniform(-8, 8, n_rays),
            np.ones(n_rays),
        ]), dtype)

        sync(rhs_once(bg, y))
        t0 = time.perf_counter()
        sync(rhs_once(bg, y))
        t_rhs = time.perf_counter() - t0

        n = 100
        sync(rhs_chain(bg, y, 2))
        t0 = time.perf_counter()
        sync(rhs_chain(bg, y, n))
        t_chain = (time.perf_counter() - t0) / n

        sync(rk4_chain(bg, y, 2))
        t0 = time.perf_counter()
        sync(rk4_chain(bg, y, 20))
        t_rk4 = (time.perf_counter() - t0) / 20

        gb = n_rays * 12 * 4 * 4 / 1e9  # 4 corners x 12 fields x f32
        print(
            f"R={n_rays}: rhs_once {t_rhs*1e3:.2f} ms (incl ~28ms rt), "
            f"rhs chained {t_chain*1e6:.0f} us "
            f"({gb / t_chain:.0f} GB/s gather), "
            f"rk4 step {t_rk4*1e6:.0f} us"
        )


if __name__ == "__main__":
    main()
