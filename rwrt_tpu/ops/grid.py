"""Finite-difference grid operators on the (nlon, nlat) sphere grid.

Pure-functional jnp re-implementations of the reference's stencils, matching
them bit-for-bit in float64 so golden differential tests pass:

- gradient_x / gradient_y / gradient_xx / gradient_yy / gradient_xy
  (reference bs.py:121-200): central differences, x periodic wrap, y one-sided
  or copied edges.
- smth9 (reference bs.py:291-305): NCL-style 9-point smoother expressed as a
  3x3 correlation added back only on the interior window [1:-2, 1:-2].
- absolute_vorticity (reference bs.py:264-279): q = (v_x - (u cos phi)_y)/cos
  phi + 2*Omega*sin(phi)*R with pole rows copied from neighbors. Note q carries
  a factor of Earth radius R (the planetary term is multiplied by rearth).
- betam / stationary wavenumber Ks (reference bs.py:379-407).

Everything here is a precompute that runs once per background field; shapes
are static so a single jit compilation covers any run.
"""

from __future__ import annotations

import jax.numpy as jnp

from rwrt_tpu.constants import omega, rearth, undef


def gradient_x(f: jnp.ndarray, dx) -> jnp.ndarray:
    """d f / d lambda with periodic wrap in the first (lon) axis.

    Matches reference bs.py:121-131: central difference everywhere, with the
    first and last columns wrapping around the lon circle.
    """
    fp = jnp.roll(f, -1, axis=0)
    fm = jnp.roll(f, 1, axis=0)
    return (fp - fm) / (2.0 * dx)


def gradient_y(f: jnp.ndarray, dy) -> jnp.ndarray:
    """d f / d phi; non-periodic, one-sided differences at the lat edges.

    Matches reference bs.py:133-142.
    """
    fy_mid = (f[:, 2:] - f[:, :-2]) / (2.0 * dy)
    fy_lo = (f[:, 1:2] - f[:, 0:1]) / dy
    fy_hi = (f[:, -1:] - f[:, -2:-1]) / dy
    return jnp.concatenate([fy_lo, fy_mid, fy_hi], axis=1)


def gradient_xx(f: jnp.ndarray, dx) -> jnp.ndarray:
    """d^2 f / d lambda^2 with periodic wrap (reference bs.py:144-154)."""
    fp = jnp.roll(f, -1, axis=0)
    fm = jnp.roll(f, 1, axis=0)
    return (fp - 2.0 * f + fm) / (dx * dx)


def gradient_yy(f: jnp.ndarray, dy) -> jnp.ndarray:
    """d^2 f / d phi^2; edge rows copied from neighbors (reference bs.py:156-166)."""
    fyy_mid = (f[:, 2:] - 2.0 * f[:, 1:-1] + f[:, :-2]) / (dy * dy)
    return jnp.concatenate(
        [fyy_mid[:, 0:1], fyy_mid, fyy_mid[:, -1:]], axis=1
    )


def gradient_xy(f: jnp.ndarray, dx, dy) -> jnp.ndarray:
    """Mixed derivative d^2 f / (d lambda d phi) (reference bs.py:168-195).

    Four-point stencil in the interior; the x direction wraps periodically
    (the reference computes the first/last columns explicitly with wrapped
    neighbors, bs.py:186-189); the y edges copy the adjacent interior row
    (bs.py:183-184, 191-194).
    """
    fp = jnp.roll(f, -1, axis=0)  # f[i+1] with wrap
    fm = jnp.roll(f, 1, axis=0)   # f[i-1] with wrap
    mid = (fp[:, 2:] - fp[:, :-2] - fm[:, 2:] + fm[:, :-2]) / (4.0 * dx * dy)
    return jnp.concatenate([mid[:, 0:1], mid, mid[:, -1:]], axis=1)


def smth9(f: jnp.ndarray, p: float = 0.5, q: float = 0.25) -> jnp.ndarray:
    """NCL-style 9-point smoother (reference bs.py:291-305).

    The reference adds `convolve(field, kernel, mode='constant')` back onto the
    field, but only on the window [1:-2, 1:-2] (note: NOT [1:-1] -- the last
    interior row/column is left unsmoothed, a quirk inherited from the Fortran
    loop bounds that we reproduce exactly). The kernel is symmetric so
    convolution equals correlation.
    """
    k_cross = p / 4.0
    k_corner = q / 4.0
    k_center = -(p + q)
    # 3x3 neighborhood sum via shifts; constant-zero padding outside the array.
    fpad = jnp.pad(f, 1, mode="constant", constant_values=0.0)

    def sh(di, dj):
        return fpad[1 + di : 1 + di + f.shape[0], 1 + dj : 1 + dj + f.shape[1]]

    corr = (
        k_center * f
        + k_cross * (sh(-1, 0) + sh(1, 0) + sh(0, -1) + sh(0, 1))
        + k_corner * (sh(-1, -1) + sh(-1, 1) + sh(1, -1) + sh(1, 1))
    )
    return f.at[1:-2, 1:-2].add(corr[1:-2, 1:-2])


def absolute_vorticity(u, v, lat, dx, dy) -> jnp.ndarray:
    """Absolute vorticity q (reference bs.py:264-279).

    q = (v_x - (u cos phi)_y) / cos phi + 2*Omega*sin(phi)*R on interior lat
    rows; the pole rows are copied from their neighbors. q carries a factor of
    Earth radius R on the planetary term, matching the reference's scaling.
    """
    coslat = jnp.cos(lat)[None, :]
    sinlat = jnp.sin(lat)[None, :]
    u_cos_y = gradient_y(u * coslat, dy)
    v_x = gradient_x(v, dx)
    q_mid = (v_x - u_cos_y) / coslat + 2.0 * omega * sinlat * rearth
    q = q_mid[:, 1:-1]
    return jnp.concatenate([q[:, 0:1], q, q[:, -1:]], axis=1)


def betam_field(u, uy, uyy, lat) -> jnp.ndarray:
    """Meridional gradient of absolute vorticity on the Mercator projection.

    beta_M = [2 Omega cos^2(phi) + (-cos(phi) u_yy + sin(phi) u_y + u/cos(phi)) / R] / R
    on interior rows; pole rows are undef (reference bs.py:379-385).
    """
    coslat = jnp.cos(lat)[None, :]
    sinlat = jnp.sin(lat)[None, :]
    bm = (
        2.0 * omega * coslat**2
        + (-coslat * uyy + sinlat * uy + u / coslat) / rearth
    ) / rearth
    edge = jnp.full_like(bm[:, 0:1], undef)
    return jnp.concatenate([edge, bm[:, 1:-1], edge], axis=1)


def stationary_wavenumber(betam, u, lat) -> jnp.ndarray:
    """Stationary wavenumber Ks = sqrt(beta_M cos(phi)/u) * R where beta_M > 0
    and u > 0, else undef; pole rows undef (reference bs.py:394-407)."""
    coslat = jnp.cos(lat)[None, :]
    valid = (betam > 0.0) & (u > 0.0)
    arg = jnp.where(valid, betam * coslat / jnp.where(u == 0.0, 1.0, u), 0.0)
    ks = jnp.where(valid, jnp.sqrt(arg) * rearth, undef)
    edge = jnp.full_like(ks[:, 0:1], undef)
    return jnp.concatenate([edge, ks[:, 1:-1], edge], axis=1)
