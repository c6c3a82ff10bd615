"""Along-ray Li-Yang wave-ray flux (WRF) diagnostics.

Counterpart of the reference's WRF postprocessor, which is ABSENT from the
reference snapshot (SURVEY.md C22); the authoritative specification is the
bundled manual, section 4 ("How to use the wave ray flux program", full text
extracted from both the English and Chinese docx), which describes the
pipeline functionally:

- ``Fun1_threshold``: "Extracts variables from wave-ray calculation results,
  sets truncation velocity thresholds, and removes abnormal wavenumber data
  (the latter two are optional parameters)." -> ``threshold_filter`` with
  optional group-speed bounds and a meridional-wavenumber cap.
- ``Fun2_region_threshold``: "Selects wave rays passing through the desired
  target region." -> ``region_mask``.
- ``Fun3_WRF_calculate``: "Calculates the Li-Yang WRF. ... it can calculate
  additional variables such as the average propagation time, average speed,
  and wave sources for wave rays passing through target areas."
  -> ``wave_ray_flux`` (the gridded flux maps) + ``region_statistics`` (the
  per-target-region aggregates).
- "the Li-Yang WRF calculation scope covers three longitude circles (from
  -360 deg to 720 deg)" -> the unwrapped longitude axis of the flux grid.

The manual defines the pipeline but NOT the flux integrand (that lives in
Yang & Li 2025, not part of the snapshot), so the cell weighting is explicit
and selectable here: ``weight='count'`` (ray-passage density with unit
direction vectors -- activity direction statistics), ``'cg'`` (group-velocity
flux), or ``'amp_cg'`` (WKB amplitude-weighted group-velocity flux, an
action-flux analogue). All three share the manual's thresholds, region logic,
and longitude bookkeeping.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rwrt_tpu.constants import deg2rad, pi, rearth
from rwrt_tpu.tracer import RayTrajectories


class WaveRayFlux(NamedTuple):
    """Accumulated flux maps on the diagnostic grid.

    lon_centers spans -360..720 degrees (the manual's three-circle scope);
    maps shaped (nlon_bins, nlat_bins).
    """

    lon_centers: jnp.ndarray
    lat_centers: jnp.ndarray
    flux_u: jnp.ndarray    # sum of w * ug_hat per cell (see `weight`)
    flux_v: jnp.ndarray    # sum of w * vg_hat per cell
    amp_sum: jnp.ndarray   # sum of |amp| per cell
    count: jnp.ndarray     # ray-point count per cell


class RegionStatistics(NamedTuple):
    """Aggregates over rays passing through a target region (the manual's
    Fun3 extras: average propagation time, average speed, wave sources)."""

    n_passing: int
    mean_entry_time: float      # seconds to first entry (entry-at-seed = 0)
    mean_speed: float           # m/s along-path up to first entry
    first_entry_step: np.ndarray  # (3, nsource, nzwn); -1 = never enters
    source_lon: np.ndarray      # seeds of passing rays, radians
    source_lat: np.ndarray


def threshold_filter(
    traj: RayTrajectories,
    amp_min: float = 0.0,
    amp_max: float = jnp.inf,
    speed_min: Optional[float] = None,
    speed_max: Optional[float] = None,
    mwn_max: Optional[float] = None,
) -> jnp.ndarray:
    """Per-point validity mask (Fun1_threshold).

    The manual's two optional Fun1 parameters are the truncation group-speed
    threshold (``speed_min``/``speed_max``, m/s -- points whose group speed
    |cg| falls outside are dropped) and the abnormal-wavenumber filter
    (``mwn_max`` -- points with |m| >= mwn_max are dropped). Amplitude bounds
    are an additional knob with permissive defaults.
    """
    amp = jnp.abs(traj.amp)
    valid = (
        jnp.isfinite(traj.lon) & jnp.isfinite(traj.lat)
        & jnp.isfinite(traj.amp) & (amp >= amp_min) & (amp <= amp_max)
    )
    if speed_min is not None or speed_max is not None:
        speed = jnp.sqrt(traj.ug ** 2 + traj.vg ** 2)
        if speed_min is not None:
            valid = valid & (speed >= speed_min)
        if speed_max is not None:
            valid = valid & (speed <= speed_max)
    if mwn_max is not None:
        valid = valid & (jnp.abs(traj.ky) < mwn_max)
    return valid


def region_mask(traj: RayTrajectories, lon_range, lat_range) -> jnp.ndarray:
    """True for rays that enter the target box at any time
    (Fun2_region_threshold). Returns (3, nsource, nzwn)."""
    return jnp.any(_in_box(traj, lon_range, lat_range), axis=0)


def _in_box(traj: RayTrajectories, lon_range, lat_range) -> jnp.ndarray:
    """(nt, 3, nsource, nzwn) bool: LIVE point inside the target box.

    Gates on amplitude finiteness, not just position: never-born rootless
    lanes keep a finite frozen seed position at every step (the integrators'
    freeze semantics), and must not count as rays passing through the box.
    """
    return _in_box_arrays(traj.lon, traj.lat, traj.amp, lon_range, lat_range)


def _in_box_arrays(lon, lat, amp, lon_range, lat_range) -> jnp.ndarray:
    """Array form of `_in_box` so block walkers can slice just these three
    fields instead of materializing a full 7-field RayTrajectories."""
    lon_deg = (lon / deg2rad) % 360.0
    lat_deg = lat / deg2rad
    if lon_range[1] - lon_range[0] >= 360.0:
        # Full circle, e.g. (0, 360) or (-180, 180): every longitude is in
        # (the modulo form below would collapse it to a single meridian).
        in_lon = jnp.ones_like(lon_deg, dtype=bool)
    else:
        lo0, lo1 = lon_range[0] % 360.0, lon_range[1] % 360.0
        if lo1 >= lo0:
            in_lon = (lon_deg >= lo0) & (lon_deg <= lo1)
        else:  # box crossing the date line
            in_lon = (lon_deg >= lo0) | (lon_deg <= lo1)
    in_box = in_lon & (lat_deg >= lat_range[0]) & (lat_deg <= lat_range[1])
    return (in_box & jnp.isfinite(lon) & jnp.isfinite(lat)
            & jnp.isfinite(amp))


def _hop_lengths(lon, lat):
    """Great-circle lengths between consecutive rows (radians); NaN -> 0."""
    dlon = lon[1:] - lon[:-1]
    dlat = lat[1:] - lat[:-1]
    a = (np.sin(dlat / 2.0) ** 2
         + np.cos(lat[:-1]) * np.cos(lat[1:]) * np.sin(dlon / 2.0) ** 2)
    a = np.clip(a, 0.0, 1.0)
    hop = 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))
    return np.where(np.isfinite(hop), hop, 0.0)


def region_statistics(
    traj: RayTrajectories,
    lon_range,
    lat_range,
    tstep: float,
    source_lon=None,
    source_lat=None,
    time_block: Optional[int] = None,
) -> RegionStatistics:
    """Fun3's target-region aggregates: how many rays reach the box, the
    average propagation time to first entry, the average along-path speed up
    to entry (great-circle path length / entry time; rays seeded inside the
    box are excluded from the speed average), and the seed positions of the
    passing rays.

    time_block: walk the time axis in blocks of this many output steps (the
    first-entry search and the cumulative path length chain exactly through
    per-block carries), so memmap-backed streamed histories never
    materialize in full. None = one pass over the whole history.
    """
    if time_block is not None and int(time_block) < 1:
        raise ValueError(f"time_block must be >= 1, got {time_block}")
    nt = int(np.asarray(traj.lon.shape)[0])
    blk = nt if not time_block else int(time_block)

    first = None          # (3, nsource, nzwn) first-entry step; -1 = never
    path_at_first = None  # path length (radians) at first entry
    carry_cum = None      # running path length at the last row walked
    prev_lon = prev_lat = None
    src_row = None
    for t0 in range(0, nt, blk):
        t1 = min(nt, t0 + blk)
        # Only the three fields this statistic reads; host numpy throughout
        # (no device round trip on the memory-bounded path).
        lon = np.asarray(traj.lon[t0:t1])
        lat = np.asarray(traj.lat[t0:t1])
        amp = np.asarray(traj.amp[t0:t1])
        in_box = np.asarray(_in_box_arrays(lon, lat, amp,
                                           lon_range, lat_range))
        if first is None:
            shape = in_box.shape[1:]
            first = np.full(shape, -1, dtype=np.int64)
            path_at_first = np.zeros(shape)
            src_row = (lon[0], lat[0])
            hop = _hop_lengths(lon, lat)
            # Path length up to each row: cumsum with a zero row on top.
            cum_rows = np.concatenate(
                [np.zeros((1,) + shape), np.cumsum(hop, 0)])
        else:
            hop = _hop_lengths(np.concatenate([prev_lon[None], lon]),
                               np.concatenate([prev_lat[None], lat]))
            cum_rows = carry_cum[None] + np.cumsum(hop, 0)
        carry_cum = cum_rows[-1]
        prev_lon, prev_lat = lon[-1], lat[-1]

        blk_any = in_box.any(axis=0)
        blk_first = in_box.argmax(axis=0)
        newly = (first < 0) & blk_any
        first = np.where(newly, t0 + blk_first, first)
        pick = np.take_along_axis(cum_rows, blk_first[None], axis=0)[0]
        path_at_first = np.where(newly, pick, path_at_first)

    passes = first >= 0
    entered = first > 0
    times = first[entered] * tstep
    speeds = path_at_first[entered] * rearth / np.maximum(times, 1e-30)

    n_passing = int(passes.sum())
    mean_entry_time = (
        float((first[passes] * tstep).mean()) if n_passing else float("nan")
    )
    mean_speed = float(speeds.mean()) if entered.any() else float("nan")

    if source_lon is None:
        src_lon, src_lat = src_row
    else:
        shape = passes.shape
        src_lon = np.broadcast_to(
            np.asarray(source_lon)[None, :, None], shape)
        src_lat = np.broadcast_to(
            np.asarray(source_lat)[None, :, None], shape)
    return RegionStatistics(
        n_passing=n_passing,
        mean_entry_time=mean_entry_time,
        mean_speed=mean_speed,
        first_entry_step=first,
        source_lon=np.asarray(src_lon)[passes],
        source_lat=np.asarray(src_lat)[passes],
    )


def _unwrap_lon_block(lon_rad: jnp.ndarray, carry=None):
    """Continuous longitude along each ray (time axis 0), radians, with an
    optional carry so long histories can be processed in time blocks.

    Starts in [0, 2*pi) and accumulates increments mapped to (-pi, pi], so a
    ray circling the globe keeps increasing/decreasing past 360 deg. Output
    is clipped to the manual's -360..720 degree bookkeeping span ("three
    longitude circles"); the carry keeps the UNCLIPPED accumulator (and the
    last wrapped row) so chaining blocks is exactly the one-shot unwrap.
    NaN rows (dead steps) contribute zero increment and emit NaN.
    """
    base = lon_rad % (2.0 * pi)
    if carry is None:
        start = base[:1]
        d = jnp.diff(base, axis=0)
    else:
        u_prev, base_prev = carry
        start = u_prev
        d = jnp.diff(jnp.concatenate([base_prev, base], axis=0), axis=0)
    d = (d + pi) % (2.0 * pi) - pi
    d = jnp.where(jnp.isnan(d), 0.0, d)
    if carry is None:
        unwrapped = jnp.concatenate(
            [start, start + jnp.cumsum(d, axis=0)], axis=0
        )
    else:
        unwrapped = start + jnp.cumsum(d, axis=0)
    new_carry = (unwrapped[-1:], base[-1:])
    unwrapped = jnp.where(jnp.isnan(base), jnp.nan, unwrapped)
    return jnp.clip(unwrapped, -2.0 * pi, 4.0 * pi), new_carry


def _unwrap_lon(lon_rad: jnp.ndarray) -> jnp.ndarray:
    """One-shot form of `_unwrap_lon_block` (whole history at once)."""
    return _unwrap_lon_block(lon_rad)[0]


@functools.partial(jax.jit, static_argnames=("nlon_bins", "nlat_bins",
                                             "weight"))
def _accumulate(lon_u_deg, lat_deg, amp, ug, vg, valid,
                nlon_bins: int, nlat_bins: int, weight: str):
    dlon = 1080.0 / nlon_bins
    dlat = 180.0 / nlat_bins
    ix = jnp.clip(((lon_u_deg + 360.0) / dlon).astype(jnp.int32), 0, nlon_bins - 1)
    iy = jnp.clip(((lat_deg + 90.0) / dlat).astype(jnp.int32), 0, nlat_bins - 1)
    flat = ix * nlat_bins + iy
    w = jnp.where(valid, 1.0, 0.0)
    amp_w = jnp.where(valid, jnp.abs(amp), 0.0)

    if weight == "count":
        speed = jnp.sqrt(ug * ug + vg * vg)
        safe = jnp.where(speed > 0, speed, 1.0)
        wu, wv = ug / safe, vg / safe
    elif weight == "cg":
        wu, wv = ug, vg
    elif weight == "amp_cg":
        wu, wv = amp * ug, amp * vg
    else:
        raise ValueError(f"unknown weight {weight!r}")

    def scat(vals):
        out = jnp.zeros(nlon_bins * nlat_bins, vals.dtype)
        return out.at[flat.reshape(-1)].add(vals.reshape(-1))

    fu = scat(jnp.where(valid, wu, 0.0))
    fv = scat(jnp.where(valid, wv, 0.0))
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
    speed_min: Optional[float] = None,
    speed_max: Optional[float] = None,
    mwn_max: Optional[float] = None,
    lon_range=None,
    lat_range=None,
    weight: str = "amp_cg",
) -> WaveRayFlux:
    """Accumulate Li-Yang wave-ray flux maps (Fun3/WRF_universal pipeline:
    Fun1 thresholds -> optional Fun2 region selection -> gridded flux).

    The longitude axis spans -360..720 degrees (manual section 4's three
    longitude circles) binned into nlon_bins cells; latitude spans -90..90.
    ``weight`` selects the cell integrand (see module docstring).
    """
    valid = threshold_filter(traj, amp_min, amp_max, speed_min, speed_max,
                             mwn_max)
    if lon_range is not None and lat_range is not None:
        keep_ray = region_mask(traj, lon_range, lat_range)
        valid = valid & keep_ray[None]

    lon_u = _unwrap_lon(traj.lon) / deg2rad
    lat_deg = traj.lat / deg2rad
    fu, fv, asum, cnt = _accumulate(
        lon_u, lat_deg, traj.amp, traj.ug, traj.vg, valid,
        nlon_bins, nlat_bins, weight,
    )
    dlon = 1080.0 / nlon_bins
    dlat = 180.0 / nlat_bins
    lon_c = -360.0 + (jnp.arange(nlon_bins) + 0.5) * dlon
    lat_c = -90.0 + (jnp.arange(nlat_bins) + 0.5) * dlat
    return WaveRayFlux(
        lon_centers=lon_c, lat_centers=lat_c,
        flux_u=fu, flux_v=fv, amp_sum=asum, count=cnt,
    )


def ensemble_flux_statistics(trajs, time_block=None, **kwargs):
    """Cellwise ensemble mean and spread of the flux maps across members.

    The pooled aggregation (concatenating member trajectories along the
    source axis, wrf_cli.load_ray_output) yields TOTAL maps over all
    members; this yields the member-statistic product instead: the
    ensemble-mean WRF map and the inter-member standard deviation (ddof=0)
    per cell -- the standard presentation for reanalysis-year ensembles
    (BASELINE.json config 5). kwargs pass through to wave_ray_flux and must
    be identical for every member (same thresholds, bins, weight).

    Returns (mean, std) as WaveRayFlux pytrees on the shared bin grid
    (std's lon/lat centers are the same arrays).

    time_block: bin each member in time blocks of this many output steps
    (wave_ray_flux_chunked; bounded device memory for long histories).
    """
    trajs = list(trajs)
    if not trajs:
        raise ValueError("ensemble_flux_statistics needs at least 1 member")
    if time_block:
        members = [wave_ray_flux_chunked(t, time_block=time_block, **kwargs)
                   for t in trajs]
    else:
        members = [wave_ray_flux(t, **kwargs) for t in trajs]
    lon_c, lat_c = members[0].lon_centers, members[0].lat_centers

    def stat(name, red):
        return red(jnp.stack([getattr(m, name).astype(jnp.result_type(
            getattr(m, name).dtype, jnp.float32)) for m in members]), 0)

    mean = WaveRayFlux(
        lon_centers=lon_c, lat_centers=lat_c,
        flux_u=stat("flux_u", jnp.mean), flux_v=stat("flux_v", jnp.mean),
        amp_sum=stat("amp_sum", jnp.mean), count=stat("count", jnp.mean),
    )
    std = WaveRayFlux(
        lon_centers=lon_c, lat_centers=lat_c,
        flux_u=stat("flux_u", jnp.std), flux_v=stat("flux_v", jnp.std),
        amp_sum=stat("amp_sum", jnp.std), count=stat("count", jnp.std),
    )
    return mean, std


def wave_ray_flux_chunked(
    traj: RayTrajectories,
    time_block: int = 128,
    nlon_bins: int = 360,
    nlat_bins: int = 90,
    amp_min: float = 0.0,
    amp_max: float = float("inf"),
    speed_min: Optional[float] = None,
    speed_max: Optional[float] = None,
    mwn_max: Optional[float] = None,
    lon_range=None,
    lat_range=None,
    weight: str = "amp_cg",
) -> WaveRayFlux:
    """wave_ray_flux over time blocks: bounded device memory at any nt.

    A 90-day 100k-ray float32 history is ~3 GB per variable group on device
    if binned in one shot; the accumulation is additive over points, so this
    walks the time axis in ``time_block``-row blocks (memmap-backed streamed
    histories from trace_rays_chunked(stream_dir=...) never materialize in
    full). The two cross-time couplings are handled exactly: the continuous
    longitude unwrap is chained through a per-block carry
    (`_unwrap_lon_block`), and the Fun2 region selection ("ray EVER enters
    the box") gets a first cheap pass accumulating the per-ray OR before the
    binning pass. Result equals wave_ray_flux up to float summation order.
    """
    if time_block < 1:
        raise ValueError(f"time_block must be >= 1, got {time_block}")
    fields = ("lon", "lat", "kx", "ky", "amp", "ug", "vg")
    nt = np.asarray(traj.lon.shape)[0]

    def block(t0, t1):
        return RayTrajectories(
            **{k: jnp.asarray(np.asarray(getattr(traj, k)[t0:t1]))
               for k in fields}
        )

    bounds = list(range(0, int(nt), time_block)) + [int(nt)]
    spans = [(a, b) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]

    keep_ray = None
    if lon_range is not None and lat_range is not None:
        # Cheap first pass: only the three fields the box test reads, in
        # host numpy (no device transfer of the 4 unused fields).
        for t0, t1 in spans:
            k = np.asarray(_in_box_arrays(
                np.asarray(traj.lon[t0:t1]), np.asarray(traj.lat[t0:t1]),
                np.asarray(traj.amp[t0:t1]), lon_range, lat_range,
            )).any(axis=0)
            keep_ray = k if keep_ray is None else (keep_ray | k)

    shape = (nlon_bins, nlat_bins)
    fu = np.zeros(shape)
    fv = np.zeros(shape)
    asum = np.zeros(shape)
    cnt = np.zeros(shape)
    carry = None
    for t0, t1 in spans:
        sub = block(t0, t1)
        valid = threshold_filter(sub, amp_min, amp_max, speed_min,
                                 speed_max, mwn_max)
        if keep_ray is not None:
            valid = valid & jnp.asarray(keep_ray)[None]
        lon_u, carry = _unwrap_lon_block(sub.lon, carry)
        bfu, bfv, basum, bcnt = _accumulate(
            lon_u / deg2rad, sub.lat / deg2rad, sub.amp, sub.ug, sub.vg,
            valid, nlon_bins, nlat_bins, weight,
        )
        fu += np.asarray(bfu)
        fv += np.asarray(bfv)
        asum += np.asarray(basum)
        cnt += np.asarray(bcnt)

    dlon = 1080.0 / nlon_bins
    dlat = 180.0 / nlat_bins
    lon_c = -360.0 + (jnp.arange(nlon_bins) + 0.5) * dlon
    lat_c = -90.0 + (jnp.arange(nlat_bins) + 0.5) * dlat
    return WaveRayFlux(
        lon_centers=lon_c, lat_centers=lat_c,
        flux_u=jnp.asarray(fu), flux_v=jnp.asarray(fv),
        amp_sum=jnp.asarray(asum), count=jnp.asarray(cnt),
    )
