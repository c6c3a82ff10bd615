"""Along-ray Li-Yang wave-ray flux (WRF) diagnostics.

Counterpart of the reference's WRF postprocessor, which is described in the
manual (section 4) but ABSENT from the reference snapshot (SURVEY.md C22):
``Fun1_threshold`` (threshold filtering of the ray output),
``Fun2_region_threshold`` (target-region selection), ``Fun3_WRF_calculate``
(flux statistics over a -360..720 degree longitude span), and the driver
``WRF_universal``. This module provides the equivalent pipeline over
RayTrajectories, implemented as fused device-side scatter-adds:

- ``threshold_filter``: drop ray points whose WKB amplitude is below a
  threshold (or above a blow-up cap) -- rays carry amp from the ray equations.
- ``region_mask``: per-ray flag for rays that pass through a target
  lon/lat box at any time.
- ``wave_ray_flux``: accumulate amplitude-weighted group-velocity flux
  (F = A * cg, the wave-action flux of WKB theory) and ray-density counts on
  a regular diagnostic grid whose longitude axis spans -360..720 degrees so
  that rays wrapping the globe up to once in either direction are kept
  distinct, following the manual's convention.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rwrt_tpu.constants import deg2rad, pi
from rwrt_tpu.tracer import RayTrajectories


class WaveRayFlux(NamedTuple):
    """Accumulated flux maps on the diagnostic grid.

    lon_edges/lat_edges in degrees; maps shaped (nlon_bins, nlat_bins).
    """

    lon_centers: jnp.ndarray
    lat_centers: jnp.ndarray
    flux_u: jnp.ndarray    # sum of amp * ug per cell
    flux_v: jnp.ndarray    # sum of amp * vg per cell
    amp_sum: jnp.ndarray   # sum of amp per cell
    count: jnp.ndarray     # ray-point count per cell


def threshold_filter(traj: RayTrajectories, amp_min: float = 0.0,
                     amp_max: float = jnp.inf) -> jnp.ndarray:
    """Per-point validity mask (Fun1_threshold equivalent)."""
    amp = jnp.abs(traj.amp)
    return (
        jnp.isfinite(traj.lon) & jnp.isfinite(traj.lat)
        & jnp.isfinite(traj.amp) & (amp >= amp_min) & (amp <= amp_max)
    )


def region_mask(traj: RayTrajectories, lon_range, lat_range) -> jnp.ndarray:
    """True for rays that enter the target box at any time
    (Fun2_region_threshold equivalent). Returns (3, nsource, nzwn)."""
    lon_deg = (traj.lon / deg2rad) % 360.0
    lat_deg = traj.lat / deg2rad
    lo0, lo1 = lon_range[0] % 360.0, lon_range[1] % 360.0
    if lo1 >= lo0:
        in_lon = (lon_deg >= lo0) & (lon_deg <= lo1)
    else:  # box crossing the date line
        in_lon = (lon_deg >= lo0) | (lon_deg <= lo1)
    in_box = in_lon & (lat_deg >= lat_range[0]) & (lat_deg <= lat_range[1])
    return jnp.any(in_box & jnp.isfinite(traj.lon), axis=0)


def _unwrap_lon(lon_rad: jnp.ndarray) -> jnp.ndarray:
    """Continuous longitude along each ray (time axis 0), radians.

    Starts in [0, 2*pi) and accumulates increments mapped to (-pi, pi], so a
    ray circling the globe keeps increasing/decreasing past 360 deg. Output is
    clipped to the manual's -360..720 degree bookkeeping span.
    """
    base = lon_rad % (2.0 * pi)
    d = jnp.diff(base, axis=0)
    d = (d + pi) % (2.0 * pi) - pi
    d = jnp.where(jnp.isnan(d), 0.0, d)
    unwrapped = jnp.concatenate(
        [base[:1], base[:1] + jnp.cumsum(d, axis=0)], axis=0
    )
    unwrapped = jnp.where(jnp.isnan(base), jnp.nan, unwrapped)
    return jnp.clip(unwrapped, -2.0 * pi, 4.0 * pi)


@functools.partial(jax.jit, static_argnames=("nlon_bins", "nlat_bins"))
def _accumulate(lon_u_deg, lat_deg, amp, ug, vg, valid,
                nlon_bins: int, nlat_bins: int):
    dlon = 1080.0 / nlon_bins
    dlat = 180.0 / nlat_bins
    ix = jnp.clip(((lon_u_deg + 360.0) / dlon).astype(jnp.int32), 0, nlon_bins - 1)
    iy = jnp.clip(((lat_deg + 90.0) / dlat).astype(jnp.int32), 0, nlat_bins - 1)
    flat = ix * nlat_bins + iy
    w = jnp.where(valid, 1.0, 0.0)
    amp_w = jnp.where(valid, amp, 0.0)

    def scat(vals):
        out = jnp.zeros(nlon_bins * nlat_bins, vals.dtype)
        return out.at[flat.reshape(-1)].add(vals.reshape(-1))

    fu = scat(jnp.where(valid, amp * ug, 0.0))
    fv = scat(jnp.where(valid, amp * vg, 0.0))
    asum = scat(amp_w)
    cnt = scat(w)
    shape = (nlon_bins, nlat_bins)
    return fu.reshape(shape), fv.reshape(shape), asum.reshape(shape), cnt.reshape(shape)


def wave_ray_flux(
    traj: RayTrajectories,
    nlon_bins: int = 360,
    nlat_bins: int = 90,
    amp_min: float = 0.0,
    amp_max: float = float("inf"),
    lon_range=None,
    lat_range=None,
) -> WaveRayFlux:
    """Accumulate Li-Yang wave-ray flux maps (Fun3/WRF_universal equivalent).

    The longitude axis spans -360..720 degrees (manual section 4 convention)
    binned into nlon_bins cells; latitude spans -90..90.
    """
    valid = threshold_filter(traj, amp_min, amp_max)
    if lon_range is not None and lat_range is not None:
        keep_ray = region_mask(traj, lon_range, lat_range)
        valid = valid & keep_ray[None]

    lon_u = _unwrap_lon(traj.lon) / deg2rad
    lat_deg = traj.lat / deg2rad
    fu, fv, asum, cnt = _accumulate(
        lon_u, lat_deg, traj.amp, traj.ug, traj.vg, valid,
        nlon_bins, nlat_bins,
    )
    dlon = 1080.0 / nlon_bins
    dlat = 180.0 / nlat_bins
    lon_c = -360.0 + (jnp.arange(nlon_bins) + 0.5) * dlon
    lat_c = -90.0 + (jnp.arange(nlat_bins) + 0.5) * dlat
    return WaveRayFlux(
        lon_centers=lon_c, lat_centers=lat_c,
        flux_u=fu, flux_v=fv, amp_sum=asum, count=cnt,
    )
