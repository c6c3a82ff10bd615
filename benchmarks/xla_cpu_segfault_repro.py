"""Minimal repro hunt for the XLA:CPU executable-accumulation segfault.

Round-2 finding (docs/STATUS.md "Full-suite stability"): with ~115 tests'
worth of compiled executables alive in one process, XLA:CPU's
`backend_compile` of a large sharded program (shard_map over an 8-device
virtual mesh wrapping a while_loop/scan nest) segfaults deterministically;
every smaller prefix passes, and `jax.clear_caches()` right before the big
compile cures it. The suite carries a module-scoped cache-clear Band-Aid in
tests/test_shardmap.py; THIS script tries to reproduce the crash without
the test suite, so the workaround can be pinned to (and eventually retired
against) a standalone upstream-reportable case.

Protocol: compile-and-hold N distinct small programs (each gets unique
constant folding so nothing dedups), then compile one deep sharded program.
Run with increasing N until the child dies with SIGSEGV:

    python benchmarks/xla_cpu_segfault_repro.py          # ladder, subprocess per N
    REPRO_N=600 python benchmarks/xla_cpu_segfault_repro.py --one   # single shot

Exit status of each child is reported; a negative status (-11) is the
segfault. Results belong in docs/STATUS.md next to the suite workaround.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one_shot_big(n):
    """Variant: accumulate N structurally-large executables (shard_map over
    8 virtual devices wrapping while_loop+scan, unique shapes) — the small-
    program ladder (one_shot) does NOT crash through n=1500, so count alone
    is not the trigger; the suite's live set is ~100+ LARGE programs."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)

    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.array(jax.devices()), ("rays",))
    kept = []
    for i in range(n):
        w = 24 + (i % 13)  # unique minor shape defeats dedup

        def chunk(y, _i=i):
            def body(c):
                it, yy = c
                def scan_body(carry, t):
                    z = jnp.tanh(carry * (1.0001 + _i * 1e-6) + t)
                    return z, (z[0], jnp.sum(z))
                yy2, (h1, h2) = jax.lax.scan(scan_body, yy,
                                             jnp.arange(12.0 + _i % 3))
                return it + 1, yy2 + jnp.sum(h1) + jnp.mean(h2)
            _, out = jax.lax.while_loop(lambda c: c[0] < 6, body, (0, y))
            return out

        g = jax.jit(shard_map(chunk, mesh=mesh, in_specs=P("rays"),
                              out_specs=P("rays")))
        g(jnp.ones((8 * 16, w))).block_until_ready()
        kept.append(g)
        if (i + 1) % 10 == 0:
            print(f"#   {i + 1}/{n} big executables alive", flush=True)
    print(f"# big-mode n={n}: all compiles OK", flush=True)


def one_shot(n):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)

    # Phase 1: accumulate N distinct live executables (unique shapes +
    # constants defeat both the jit cache and XLA program dedup).
    kept = []
    for i in range(n):
        k = 3 + (i % 41)

        def f(x, _i=i, _k=k):
            y = x * (_i + 1.5)
            for _ in range(3):
                y = jnp.tanh(y @ jnp.eye(_k, dtype=y.dtype) + _i)
            return jnp.sum(y)

        g = jax.jit(f)
        g(jnp.ones((k, k)))  # compile + execute
        kept.append(g)  # hold a strong ref so nothing is collected
        if (i + 1) % 100 == 0:
            print(f"#   {i + 1}/{n} executables alive", flush=True)

    # Phase 2: the big sharded compile (same structural shape as the
    # suite's killer: shard_map over 8 devices, while_loop around a scan).
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.array(jax.devices()), ("rays",))

    def chunk(y):
        def body(c):
            it, yy = c
            def scan_body(carry, t):
                z = jnp.tanh(carry * 1.0001 + t)
                return z, z[0]
            yy2, hist = jax.lax.scan(scan_body, yy, jnp.arange(16.0))
            return it + 1, yy2 + jnp.sum(hist)
        def cond(c):
            return c[0] < 8
        _, out = jax.lax.while_loop(cond, body, (0, y))
        return out

    big = jax.jit(
        shard_map(chunk, mesh=mesh, in_specs=P("rays"), out_specs=P("rays")))
    out = big(jnp.ones((8 * 64, 32)))
    out.block_until_ready()
    print(f"# n={n}: big sharded compile OK", flush=True)


def main():
    if "--one" in sys.argv:
        one_shot(int(os.environ.get("REPRO_N", "500")))
        return
    if "--one-big" in sys.argv:
        one_shot_big(int(os.environ.get("REPRO_N", "120")))
        return
    big = "--big" in sys.argv
    flag = "--one-big" if big else "--one"
    for n in ((40, 80, 160) if big else (100, 300, 600, 1000, 1500)):
        env = dict(os.environ, REPRO_N=str(n))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag], env=env,
            capture_output=True, text=True, timeout=1800)
        tail = (p.stdout or "").strip().splitlines()[-1:] or ["(no output)"]
        print(f"n={n}: rc={p.returncode}  {tail[0]}"
              + ("  <-- CRASH" if p.returncode < 0 else ""), flush=True)
        if p.returncode < 0:
            err = (p.stderr or "").strip().splitlines()[-3:]
            for ln in err:
                print("   ", ln)
            break


if __name__ == "__main__":
    main()
