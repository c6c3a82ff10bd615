"""Device-resident basic state: the background flow and its derivative stack.

TPU-native counterpart of the reference `BS` class (reference bs.py:69-407).
Instead of 27 mutable attribute arrays, the basic state is an immutable pytree
holding one stacked field tensor plus grid metadata, built by a single jitted
precompute:

- ``prepare(u, v, lat, lon)`` mirrors ``BS.ready`` (reference bs.py:318-407):
  absolute vorticity, the 18-field derivative stack (u, v, ux, uy, vx, vy, qx,
  qy, qxx, qxy, qyx, qyy, qxxx, qxxy, qxyy, qyyy, qyxx, qyyx -- reference
  bs.py:349-368), smth9 smoothing of qxx/qyy/qxy only (bs.py:345-347, applied
  AFTER the third derivatives are computed from the unsmoothed fields, and with
  qyx kept as the UNsmoothed copy of qxy, bs.py:337), the cyclic wrap column
  (bs.py:370-372), beta_M and the stationary wavenumber Ks (bs.py:379-407).

The field tensor layout is ``(nlon_wrap, nlat, 18)``: the 4-corner bilinear
gather in ops/interp.py flattens the leading two axes so each gathered row is
one contiguous 18-vector.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rwrt_tpu.constants import pi
from rwrt_tpu.ops import grid as g

#: Order of the stacked background fields (reference bs.py:349-368).
FIELD_NAMES = (
    "u", "v", "ux", "uy", "vx", "vy",
    "qx", "qy", "qxx", "qxy", "qyx", "qyy",
    "qxxx", "qxxy", "qxyy", "qyyy", "qyxx", "qyyx",
)
NUM_FIELDS = len(FIELD_NAMES)


class BasicState(NamedTuple):
    """Immutable background state sampled by the ray integrator.

    Attributes:
      fields: (nlon + xcyclic, nlat, 18) stacked derivative fields.
      lon: (nlon,) longitudes in radians, ascending from lon[0].
      lat: (nlat,) latitudes in radians, ascending.
      betam: (nlon, nlat) Mercator beta; undef at pole rows.
      ks: (nlon, nlat) stationary wavenumber; undef where invalid.
      q: (nlon, nlat) absolute vorticity (diagnostic output only).
      xcyclic: static bool, whether lon wraps.
    """

    fields: jnp.ndarray
    lon: jnp.ndarray
    lat: jnp.ndarray
    betam: jnp.ndarray
    ks: jnp.ndarray
    q: jnp.ndarray
    xcyclic: bool
    # Time axis metadata; meaningful only when fields is 4-D (T, W, H, 18)
    # (time-varying background, BASELINE.json config 4).
    bg_t0: float = 0.0
    bg_dt: float = 1.0

    @property
    def nlon(self) -> int:
        return self.lon.shape[0]

    @property
    def nlat(self) -> int:
        return self.lat.shape[0]

    @property
    def dx(self):
        return 2.0 * pi / self.nlon

    @property
    def dy(self):
        return pi / (self.nlat - 1)


# xcyclic changes output shapes -> static argument.
@functools.partial(jax.jit, static_argnames=("xcyclic",))
def _prepare_jit(u, v, lat, dx, dy, xcyclic: bool):
    q = g.absolute_vorticity(u, v, lat, dx, dy)

    ux = g.gradient_x(u, dx)
    uy = g.gradient_y(u, dy)
    vx = g.gradient_x(v, dx)
    vy = g.gradient_y(v, dy)
    qx = g.gradient_x(q, dx)
    qy = g.gradient_y(q, dy)
    uyy = g.gradient_yy(u, dy)
    qxx = g.gradient_xx(q, dx)
    qyy = g.gradient_yy(q, dy)
    qxy = g.gradient_xy(q, dx, dy)
    # qyx is the UNsmoothed qxy (reference bs.py:337: copied before smth9).
    qyx = qxy
    # Third derivatives are taken from the UNsmoothed second derivatives
    # (reference bs.py:338-343 run before the smth9 calls at bs.py:345-347).
    qxxx = g.gradient_x(qxx, dx)
    qxxy = g.gradient_y(qxx, dy)
    qxyy = g.gradient_y(qxy, dy)
    qyyy = g.gradient_y(qyy, dy)
    qyxx = g.gradient_x(qxy, dx)
    qyyx = g.gradient_x(qyy, dx)

    qxx = g.smth9(qxx)
    qyy = g.smth9(qyy)
    qxy = g.smth9(qxy)

    fields = jnp.stack(
        [u, v, ux, uy, vx, vy, qx, qy, qxx, qxy, qyx, qyy,
         qxxx, qxxy, qxyy, qyyy, qyxx, qyyx],
        axis=-1,
    )
    if xcyclic:
        fields = jnp.concatenate([fields, fields[0:1]], axis=0)

    betam = g.betam_field(u, uy, uyy, lat)
    ks = g.stationary_wavenumber(betam, u, lat)
    return fields, betam, ks, q


def prepare(
    u,
    v,
    lat=None,
    lon=None,
    *,
    xcyclic: bool = True,
    read_dtype=jnp.float32,
    cal_dtype=jnp.float32,
) -> BasicState:
    """Build the BasicState from a gridded wind field.

    Args:
      u, v: (nlon, nlat) zonal/meridional wind. Cast through ``read_dtype``
        first (the reference ingests NetCDF data as float32, bs.py:70-81) and
        then to ``cal_dtype`` for the derivative pipeline.
      lat, lon: coordinates in RADIANS, ascending. If None, a regular global
        grid is assumed (lat from -pi/2 to pi/2, lon from 0, reference
        bs.py:239-243).
      xcyclic: append the cyclic wrap column (reference bs.py:370-372).
      cal_dtype: compute dtype; float32 for TPU speed, float64 (with
        jax_enable_x64) for bit-parity with the reference.
    """
    u = jnp.asarray(u, read_dtype)
    v = jnp.asarray(v, read_dtype)
    if u.ndim != 2 or u.shape != v.shape:
        raise ValueError(f"u/v must be matching 2-D (nlon, nlat); got "
                         f"{u.shape} vs {v.shape}")
    nlon, nlat = u.shape
    if nlon < 2 or nlat < 2:
        raise ValueError("need at least 2 points per axis")  # reference
        # interpolation.py:269-277 (not enough points / dmonoinc checks)
    if lat is not None:
        lat_np = np.asarray(lat)
        if not np.all(np.diff(lat_np) > 0):
            raise ValueError(
                "lat must be strictly ascending (reference dmonoinc, "
                "interpolation.py:25-34; ncio.load_wind flips descending "
                "grids automatically)"
            )
    dx = 2.0 * pi / nlon
    dy = pi / (nlat - 1)
    if lat is None:
        lat = -pi * 0.5 + np.arange(nlat) * dy
    if lon is None:
        lon = np.arange(nlon) * dx
    lat = jnp.asarray(lat, cal_dtype)
    lon = jnp.asarray(lon, cal_dtype)

    u = u.astype(cal_dtype)
    v = v.astype(cal_dtype)
    fields, betam, ks, q = _prepare_jit(
        u, v, lat, jnp.asarray(dx, cal_dtype), jnp.asarray(dy, cal_dtype), xcyclic
    )
    return BasicState(
        fields=fields, lon=lon, lat=lat, betam=betam, ks=ks, q=q,
        xcyclic=xcyclic,
    )


def prepare_time_varying(
    u,
    v,
    lat=None,
    lon=None,
    *,
    bg_t0: float = 0.0,
    bg_dt: float,
    xcyclic: bool = True,
    read_dtype=jnp.float32,
    cal_dtype=jnp.float32,
) -> BasicState:
    """Build a time-varying BasicState from (T, nlon, nlat) wind frames.

    Each frame runs through the same precompute as `prepare` (vmapped over
    time); the ray RHS then interpolates the field stack linearly in time
    (exact, since every derived field is linear in u, v). bg_t0/bg_dt give
    the model time (seconds) of frame 0 and the frame spacing. No reference
    counterpart (the reference background is static); BASELINE.json config 4.
    """
    u = jnp.asarray(u, read_dtype).astype(cal_dtype)
    v = jnp.asarray(v, read_dtype).astype(cal_dtype)
    tdim, nlon, nlat = u.shape
    dx = 2.0 * pi / nlon
    dy = pi / (nlat - 1)
    if lat is None:
        lat = -pi * 0.5 + np.arange(nlat) * dy
    if lon is None:
        lon = np.arange(nlon) * dx
    lat = jnp.asarray(lat, cal_dtype)
    lon = jnp.asarray(lon, cal_dtype)

    fields, betam, ks, q = jax.vmap(
        lambda uu, vv: _prepare_jit(
            uu, vv, lat, jnp.asarray(dx, cal_dtype), jnp.asarray(dy, cal_dtype),
            xcyclic,
        )
    )(u, v)
    return BasicState(
        fields=fields, lon=lon, lat=lat, betam=betam, ks=ks, q=q,
        xcyclic=xcyclic, bg_t0=float(bg_t0), bg_dt=float(bg_dt),
    )
