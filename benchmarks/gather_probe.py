"""Probe TPU gather strategies for the bilinear background sample.

TPUs have no hardware gather; XLA lowers row gathers to per-row scalar-core
work, so cost scales with ROW COUNT more than bytes. Strategies probed:

  A. 4 separate row gathers from (WH, C)            [current implementation]
  B. 1 row gather from a corner-packed (WH, 4*C) stack (precompute packs the
     2x2 corner neighborhood per cell)
  C. gather along lanes from transposed (C, WH)
  D. one-hot matmul over the latitude axis only (dense MXU work)
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    W, H, C = 145, 73, 12
    R = 131072
    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.normal(size=(W * H, C)).astype(np.float32))
    F4 = jnp.asarray(rng.normal(size=(W * H, 4 * C)).astype(np.float32))
    Ft = jnp.asarray(np.ascontiguousarray(np.asarray(F).T))
    idx = jnp.asarray(rng.integers(0, (W - 1) * H - 2, R).astype(np.int32))

    def sync(x):
        return float(np.asarray(jnp.sum(jnp.ravel(x)[:16])))

    def timeit(f, *a, n=30):
        g = jax.jit(f)
        sync(g(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            out = g(*a)
        sync(out)
        return (time.perf_counter() - t0) / n

    def gather4(F, idx):
        a = jnp.take(F, idx, axis=0)
        b = jnp.take(F, idx + 1, axis=0)
        c = jnp.take(F, idx + H, axis=0)
        d = jnp.take(F, idx + H + 1, axis=0)
        return a * 0.1 + b * 0.2 + c * 0.3 + d * 0.4

    def gather1(F4, idx):
        return jnp.take(F4, idx, axis=0)

    def gather_lanes(Ft, idx):
        return jnp.take(Ft, idx, axis=1)

    t_a = timeit(gather4, F, idx)
    t_b = timeit(gather1, F4, idx)
    t_c = timeit(gather_lanes, Ft, idx)

    # D: one-hot over lat (H=73) x dynamic-slice over lon? Just one-hot over
    # full flattened grid in blocks is too big; probe one-hot over H only
    # after gathering lon columns is still a gather. Instead probe a pure
    # one-hot matmul of R x H @ H x C as an MXU reference point.
    Oy = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32))
    Fh = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32))

    def onehot(Oy, Fh):
        return Oy @ Fh

    t_d = timeit(onehot, Oy, Fh)

    print(f"A 4x row-gather (WH,{C}):      {t_a*1e3:8.3f} ms")
    print(f"B 1x row-gather (WH,{4*C}):     {t_b*1e3:8.3f} ms")
    print(f"C lane-gather ({C},WH):        {t_c*1e3:8.3f} ms")
    print(f"D matmul R x H @ H x C:       {t_d*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
