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
    for n in (100, 300, 600, 1000, 1500):
        env = dict(os.environ, REPRO_N=str(n))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one"], env=env,
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
