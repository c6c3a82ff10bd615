"""Gather probe v2: chain iterations INSIDE one jit (fori_loop) to remove
per-dispatch overhead, which dominates small-kernel timing through the axon
tunnel."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    W, H, C = 145, 73, 12
    R = 131072
    N = 50
    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.normal(size=(W * H, C)).astype(np.float32))
    F4 = jnp.asarray(rng.normal(size=(W * H, 4 * C)).astype(np.float32))
    idx0 = jnp.asarray(rng.integers(0, (W - 1) * H - 2, R).astype(np.int32))

    def sync(x):
        return float(np.asarray(jnp.sum(jnp.ravel(x)[:16])))

    def timeit(f, *a):
        g = jax.jit(f)
        sync(g(*a))
        t0 = time.perf_counter()
        out = g(*a)
        sync(out)
        return (time.perf_counter() - t0) / N

    def chain(body):
        def run(Fx, idx):
            def it(i, acc):
                v = body(Fx, (idx + i) % ((W - 1) * H - 2))
                return acc + jnp.sum(v, axis=-1)

            return jax.lax.fori_loop(0, N, it, jnp.zeros(R, jnp.float32))

        return run

    def gather4(F, idx):
        a = jnp.take(F, idx, axis=0)
        b = jnp.take(F, idx + 1, axis=0)
        c = jnp.take(F, idx + H, axis=0)
        d = jnp.take(F, idx + H + 1, axis=0)
        return a * 0.1 + b * 0.2 + c * 0.3 + d * 0.4

    def gather1(F4, idx):
        return jnp.take(F4, idx, axis=0)

    def elementwise(F, idx):
        x = idx.astype(jnp.float32)
        return (x * 1.0000001 + 0.5)[:, None] * jnp.ones((1, C), jnp.float32)

    t_a = timeit(chain(gather4), F, idx0)
    t_b = timeit(chain(gather1), F4, idx0)
    t_e = timeit(chain(elementwise), F, idx0)

    # MXU sanity: big matmul inside one jit
    A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))

    def mm(A, _):
        def it(i, acc):
            return (acc @ A) * 1e-3

        return jax.lax.fori_loop(0, N, it, A)

    g = jax.jit(mm)
    sync(g(A, idx0))
    t0 = time.perf_counter()
    sync(g(A, idx0))
    t_m = (time.perf_counter() - t0) / N

    print(f"A 4x row-gather chained:  {t_a*1e3:8.3f} ms/iter")
    print(f"B 1x packed gather:       {t_b*1e3:8.3f} ms/iter")
    print(f"E elementwise floor:      {t_e*1e3:8.3f} ms/iter")
    print(f"M 4096^3 f32 matmul:      {t_m*1e3:8.3f} ms/iter "
          f"({2*4096**3/t_m/1e12:.1f} TF/s)")


if __name__ == "__main__":
    main()
