"""Adjoint sensitivity of ray trajectories to the background wind.

`jax.grad` differentiates the whole pipeline -- basic-state precompute,
dispersion-root seeding, RK4 integration -- so questions like "which jet
perturbation steers this ray poleward?" are one reverse pass instead of a
finite-difference sweep per parameter. No reference counterpart (the
reference's host eigenvalue solvers and numba kernels are opaque to
autodiff). See docs/DESIGN.md §6f.

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python examples/adjoint_sensitivity.py
"""

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import rwrt_tpu as rt  # noqa: E402
from rwrt_tpu import tracer  # noqa: E402
from rwrt_tpu.solvers import rk4  # noqa: E402


def main():
    nlon, nlat = 72, 37
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    u0 = (20.0 * np.cos(lat)[None, :] ** 2
          + 25.0 * np.exp(-(((np.degrees(lat)[None, :] - 40.0) / 12.0) ** 2))
          + 8.0 * np.cos(2 * lon)[:, None] * np.cos(lat)[None, :] ** 2)
    v0 = 3.0 * np.sin(lon)[:, None] * np.cos(lat)[None, :]

    def final_latitude(jet_scale, seed_lat):
        """Latitude (rad) of the first root's ray after 4 model days."""
        bs = rt.prepare(jet_scale * jnp.asarray(u0), jnp.asarray(v0),
                        lat, lon, read_dtype="float64", cal_dtype="float64")
        bg = tracer.make_background(bs, 0.0)
        y0, _, _ = tracer.initialize(
            bg, jnp.asarray([0.3]), jnp.asarray([seed_lat]),
            jnp.asarray([4.0]))
        ys, _, _ = rk4.trace(bg, y0, 7200.0, 49, jnp.asarray(0.2))
        return ys[-1, 1, 0]

    val = final_latitude(1.0, 0.25)
    d_jet, d_seed = jax.grad(final_latitude, argnums=(0, 1))(1.0, 0.25)

    # Check against central differences.
    eps = 1e-6
    fd_jet = (final_latitude(1.0 + eps, 0.25)
              - final_latitude(1.0 - eps, 0.25)) / (2 * eps)
    fd_seed = (final_latitude(1.0, 0.25 + eps)
               - final_latitude(1.0, 0.25 - eps)) / (2 * eps)

    print(f"final latitude after 4 days: {np.degrees(float(val)):.3f} deg")
    print(f"d(final lat)/d(jet scale):  grad {float(d_jet):+.8f}   "
          f"fd {float(fd_jet):+.8f}")
    print(f"d(final lat)/d(seed lat):   grad {float(d_seed):+.8f}   "
          f"fd {float(fd_seed):+.8f}")


if __name__ == "__main__":
    main()
