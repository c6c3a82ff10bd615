"""Probe: can a Pallas kernel beat XLA's row gather for the background
sample? (VERDICT r1 attack (a).)

TPU has no hardware gather; XLA's per-row cost was measured at ~3.7 ns/row
(48-float rows, round 1). The Pallas candidate keeps the packed field table
resident in VMEM (~2 MB) and copies one dynamically-addressed row per
fori_loop iteration -- the only expressible per-row primitive (Mosaic has no
vector gather either). Also measures XLA gather row-width scaling (the
cost model that killed the block-local multi-row design).

Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/pallas_gather_probe.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WH = 145 * 73
    R = 131072
    N = 30  # chained iterations inside one jit
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, WH - 2, R).astype(np.int32))

    def sync(x):
        return float(np.asarray(jnp.sum(jnp.ravel(x)[:16])))

    def timeit(f, *a):
        g = jax.jit(f)
        sync(g(*a))
        t0 = time.perf_counter()
        out = g(*a)
        sync(out)
        return (time.perf_counter() - t0) / N

    def chain(body, table):
        def run(table, idx):
            def it(i, acc):
                v = body(table, (idx + i) % (WH - 2))
                return acc + jnp.sum(v, axis=-1)

            return jax.lax.fori_loop(0, N, it, jnp.zeros(R, jnp.float32))

        return run

    # --- XLA row-width scaling ---
    for width in (48, 128, 384):
        table = jnp.asarray(
            rng.normal(size=(WH, width)).astype(np.float32))

        def xla_gather(t, i):
            return t.at[i].get(mode="promise_in_bounds")

        dt = timeit(chain(xla_gather, table), table, idx0)
        print(f"XLA gather width={width:4d}: {dt*1e3:7.3f} ms "
              f"= {dt/R*1e9:6.2f} ns/row")

    # --- Pallas VMEM-table gather, one dynamic row copy per iteration ---
    width = 48
    table = jnp.asarray(rng.normal(size=(WH, width)).astype(np.float32))
    BLOCK = 2048

    def gather_kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = table_ref[idx_ref[i], :]
            return 0

        jax.lax.fori_loop(0, BLOCK, body, 0)  # Mosaic: unroll=1 only

    def pallas_gather(t, i):
        return pl.pallas_call(
            gather_kernel,
            grid=(R // BLOCK,),
            in_specs=[
                pl.BlockSpec((BLOCK,), lambda g: (g,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table
            ],
            out_specs=pl.BlockSpec((BLOCK, width), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((R, width), jnp.float32),
        )(i, t)

    try:
        dt = timeit(chain(pallas_gather, table), table, idx0)
        print(f"Pallas VMEM row-copy:     {dt*1e3:7.3f} ms "
              f"= {dt/R*1e9:6.2f} ns/row")
    except Exception as e:  # noqa: BLE001 - probe reports, never raises
        print(f"Pallas variant failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
