"""Characterize per-iteration overhead of device-side loops on this TPU.

If fori/while loop iterations carry a fixed cost regardless of body size,
the adaptive solver's wall time is gated by ITERATION COUNT, not by gather
bandwidth -- that changes the optimization strategy entirely.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    def sync(x):
        return float(np.asarray(jnp.sum(jnp.ravel(x)[:8])))

    def timed(g, *a, n_iters=1):
        sync(g(*a))
        t0 = time.perf_counter()
        sync(g(*a))
        return (time.perf_counter() - t0) / n_iters

    results = []

    # scalar-carry loop: pure loop overhead
    @jax.jit
    def scalar_loop(x):
        def body(i, c):
            return c * 1.0000001 + 1e-9

        return jax.lax.fori_loop(0, 2000, body, x)

    results.append(("scalar carry x2000", timed(scalar_loop, jnp.float32(1.0), n_iters=2000)))

    # (R,) carry loops at different R
    for r in (1024, 131072):
        x = jnp.ones(r, jnp.float32)

        @jax.jit
        def vec_loop(x):
            def body(i, c):
                return c * 1.0000001 + 1e-9

            return jax.lax.fori_loop(0, 1000, body, x)

        results.append((f"vec({r}) carry x1000", timed(vec_loop, x, n_iters=1000)))

    # (5, R) carry + modest body, like one RK stage
    r = 131072
    y = jnp.ones((5, r), jnp.float32)

    @jax.jit
    def stage_loop(y):
        def body(i, y):
            return y + 0.001 * jnp.sin(y) * jnp.cos(y)

        return jax.lax.fori_loop(0, 200, body, y)

    results.append((f"(5,{r}) sin/cos x200", timed(stage_loop, y, n_iters=200)))

    for name, t in results:
        print(f"{name:28s} {t*1e6:10.1f} us/iter")


if __name__ == "__main__":
    main()
