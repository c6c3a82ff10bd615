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


def _check_uniform_axis(coord: np.ndarray, step: float, name: str,
                        expect: str) -> None:
    """Refuse non-uniform or partial-coverage coordinate axes loudly.

    The whole device pipeline (FD gradients, fractional-index bilinear
    sampling) assumes the uniform global grid spacing dx = 2*pi/nlon,
    dy = pi/(nlat-1) that the reference hard-codes (reference bs.py:77-78 and
    its hot interpolation path, interpolation.py:78-80). The reference's
    scalar path supports any monotonic axis via searchsorted
    (interpolation.py:306-323); here a Gaussian or regional grid must be
    regridded first (see ``regrid_to_uniform``) instead of silently producing
    wrong physics.
    """
    if not np.all(np.diff(coord) > 0):
        raise ValueError(
            f"{name} must be strictly ascending (reference dmonoinc, "
            "interpolation.py:25-34; ncio.load_wind flips descending grids "
            "automatically)"
        )
    spacing = np.diff(coord)
    # Absolute floor: coordinate variables are often STORED as float32
    # DEGREES in NetCDF files. Near lon=360 deg each value carries rounding
    # up to ulp(360)/2 ~ 1.5e-5 deg ~ 2.7e-7 rad, so adjacent-spacing
    # deviation of a genuinely uniform grid can reach ~5.3e-7 rad (plus one
    # more rounding from the deg->rad conversion). 1.5e-6 rad absorbs that
    # while Gaussian grids (~1e-3 rad deviation) are still caught.
    tol = max(1e-5 * step, 1.5e-6)
    dev = float(np.abs(spacing - step).max())
    if dev > tol:
        raise ValueError(
            f"{name} axis is not the uniform {expect} grid the compute "
            f"pipeline assumes: spacing deviates from {step:.6e} rad by up "
            f"to {dev:.3e} rad (tolerance {tol:.1e}). "
            "Regrid first: basic_state.regrid_to_uniform(u, v, lat, lon)."
        )


def regrid_to_uniform(u, v, lat, lon, nlat=None, nlon=None):
    """Bilinearly regrid winds from any monotonic grid onto the uniform grid.

    Host-side, one-time preprocessing for inputs that `prepare` refuses
    (Gaussian reanalysis grids, regional subsets, ...). Interval lookup uses
    searchsorted on the actual monotonic axes -- the semantics of the
    reference's scalar interpolation path (reference interpolation.py:306-323)
    -- and the longitude axis is treated as cyclic.

    Args:
      u, v: (nlon_in, nlat_in) winds on the source grid.
      lat, lon: source coordinates in radians, ascending.
      nlat, nlon: target resolution; defaults to the source counts (nlat
        forced odd so the equator is a grid row, matching pole-to-pole
        spacing pi/(nlat-1)).

    Returns:
      (u_out, v_out, lat_out, lon_out) on the uniform global grid.
    """
    u = np.asarray(u)
    v = np.asarray(v)
    lat = np.asarray(lat, np.float64)
    lon = np.asarray(lon, np.float64)
    if nlat is None:
        nlat = lat.shape[0] if lat.shape[0] % 2 == 1 else lat.shape[0] + 1
    if nlon is None:
        nlon = lon.shape[0]
    lat_out = -0.5 * pi + np.arange(nlat) * (pi / (nlat - 1))
    lon_out = np.arange(nlon) * (2.0 * pi / nlon)

    # Cyclic extension in lon so targets beyond the last source column
    # interpolate across the wrap (reference interpolation.py:283-299).
    lon_ext = np.concatenate([lon, lon[:1] + 2.0 * pi])

    def interp_axis(coord, targets):
        """Interval index + fractional weight, clamped at the ends."""
        i0 = np.clip(np.searchsorted(coord, targets, side="right") - 1,
                     0, coord.shape[0] - 2)
        wgt = (targets - coord[i0]) / (coord[i0 + 1] - coord[i0])
        return i0, np.clip(wgt, 0.0, 1.0)

    # Map each target into the source's own cyclic window [lon[0],
    # lon[0]+2*pi) -- NOT just "shift targets below lon[0] up", which leaves
    # targets ABOVE lon_ext[-1] clamping to one source column when the
    # source uses the -180..180 convention.
    jx, wx = interp_axis(lon_ext, lon[0] + (lon_out - lon[0]) % (2.0 * pi))
    jy, wy = interp_axis(lat, np.clip(lat_out, lat[0], lat[-1]))
    jx1 = jx + 1

    def regrid(f):
        f_ext = np.concatenate([f, f[:1]], axis=0)
        c00 = f_ext[jx[:, None], jy[None, :]]
        c10 = f_ext[jx1[:, None], jy[None, :]]
        c01 = f_ext[jx[:, None], jy[None, :] + 1]
        c11 = f_ext[jx1[:, None], jy[None, :] + 1]
        wxg = wx[:, None]
        wyg = wy[None, :]
        return ((1 - wxg) * (1 - wyg) * c00 + wxg * (1 - wyg) * c10
                + (1 - wxg) * wyg * c01 + wxg * wyg * c11)

    return regrid(u), regrid(v), lat_out, lon_out


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


def _roll_lon_canonical(u, v, lon):
    """Roll the grid so longitude starts at its smallest value mod 2*pi.

    Exact (the grid is periodic in lon), and REQUIRED for grids whose lon
    does not start at 0 (e.g. the -180..180 convention): the reference's
    index-anchored edge quirks (smth9 leaves its border columns unsmoothed,
    bs.py:291-305; the mixed xy derivative copies edge columns,
    bs.py:168-195) would otherwise anchor at an arbitrary input roll, and
    the samplers index the stack as (lon - lon0) mod 2*pi from column 0.
    After the roll, grids in any convention compute the identical basic
    state (quirks anchored at the 0-degree seam, where the reference's own
    loader always puts them). Rolls along the last-but-one axis so 2-D
    (nlon, nlat) and 3-D (T, nlon, nlat) stacks both work.
    """
    lon = np.asarray(lon, np.float64) % (2.0 * pi)
    k = int(np.argmin(lon))
    if k == 0:
        return u, v, lon
    return (jnp.roll(u, -k, axis=-2), jnp.roll(v, -k, axis=-2),
            np.roll(lon, -k))


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
    dx = 2.0 * pi / nlon
    dy = pi / (nlat - 1)
    if lat is not None:
        _check_uniform_axis(np.asarray(lat), dy, "lat",
                            "pole-to-pole (nlat-1 equal steps of pi/(nlat-1))")
    if lon is not None:
        _check_uniform_axis(np.asarray(lon), dx, "lon",
                            "global (nlon equal steps of 2*pi/nlon)")
    if lat is None:
        lat = -pi * 0.5 + np.arange(nlat) * dy
    if lon is None:
        lon = np.arange(nlon) * dx
    u, v, lon = _roll_lon_canonical(u, v, lon)
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
    if lat is not None:
        _check_uniform_axis(np.asarray(lat), dy, "lat",
                            "pole-to-pole (nlat-1 equal steps of pi/(nlat-1))")
    if lon is not None:
        _check_uniform_axis(np.asarray(lon), dx, "lon",
                            "global (nlon equal steps of 2*pi/nlon)")
    if lat is None:
        lat = -pi * 0.5 + np.arange(nlat) * dy
    if lon is None:
        lon = np.arange(nlon) * dx
    u, v, lon = _roll_lon_canonical(u, v, lon)
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
