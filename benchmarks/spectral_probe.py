"""Probe: gather vs tensor-basis (MXU) background sampling cost on device.

Times one RHS-evaluation-worth of background sampling at north-star lane
counts for three implementations:

  gather    - the production corner-packed bilinear row gather
              (ops.interp.sample_raw_packed; one 48-float row per lane)
  spectral  - XLA two-contraction evaluation (ops.spectral_sample
              .sample_spectral): materializes (R, L*C) through HBM
  pallas    - fused kernel (sample_spectral_pallas): basis tiles built in
              VMEM, nothing materialized in HBM

Run on the TPU worker when it is healthy (single client at a time — see
MEASUREMENTS.md / the bench protocol). On CPU this still runs but the
numbers mean nothing; the Pallas path uses interpreter mode off-TPU.

Usage: python benchmarks/spectral_probe.py [R] [m_max] [l_max]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from rwrt_tpu.models import basic_state
    from rwrt_tpu.ops import interp
    from rwrt_tpu.ops import spectral_sample as ss

    r = int(sys.argv[1]) if len(sys.argv) > 1 else 61440
    m_max = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    l_max = int(sys.argv[3]) if len(sys.argv) > 3 else 43

    nlon, nlat = 192, 94
    dy = np.pi / (nlat - 1)
    glat = (-np.pi / 2 + np.arange(nlat) * dy)[None, :] * np.ones((nlon, 1))
    u = 15.0 * np.cos(glat) ** 2
    v = 0.05 * u
    bs = basic_state.prepare(u, v)

    hot = bs.fields[..., :interp.NUM_HOT]
    packed = interp.pack_corners(hot)
    sbg = ss.fit_spectral(np.asarray(hot), m_max=m_max, l_max=l_max,
                          xcyclic=True, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    lon = jnp.asarray(rng.uniform(0, 2 * np.pi, r), jnp.float32)
    lat = jnp.asarray(rng.uniform(-1.4, 1.4, r), jnp.float32)
    lon0, lat0 = float(bs.lon[0]), float(bs.lat[0])
    dx, dyf = float(bs.dx), float(bs.dy)

    fns = {
        "gather": jax.jit(lambda lo, la: interp.sample_raw_packed(
            packed, lon0, lat0, dx, dyf, lo, la)),
        "spectral": jax.jit(lambda lo, la: ss.sample_spectral(sbg, lo, la)),
        "pallas": jax.jit(lambda lo, la: ss.sample_spectral_pallas(
            sbg, lo, la)),
    }

    print(f"backend={jax.default_backend()} R={r} m_max={m_max} "
          f"l_max={l_max} Mp={2 * m_max + 1} basis={(2 * m_max + 1) * l_max}")
    results = {}
    for name, fn in fns.items():
        out = fn(lon, lat)
        jax.block_until_ready(out)  # compile + warm
        n_it = 20
        t0 = time.perf_counter()
        for _ in range(n_it):
            out = fn(lon, lat)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n_it
        results[name] = dt
        print(f"{name:9s} {dt * 1e6:9.1f} us/eval  "
              f"{dt / r * 1e9:7.2f} ns/lane")
    # Consistency (spectral is an approximation of bilinear; report the gap).
    g = np.asarray(fns["gather"](lon, lat))
    s = np.asarray(fns["spectral"](lon, lat))
    mask = np.isfinite(g) & np.isfinite(s)
    if mask.any():
        scale = np.nanmax(np.abs(g)) or 1.0
        print(f"max |spectral-gather|/scale = "
              f"{np.abs(s[mask] - g[mask]).max() / scale:.2e}")
    return results


if __name__ == "__main__":
    main()
