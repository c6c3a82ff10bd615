"""Grid-wide wavenumber diagnostics: mwn roots and group velocities everywhere.

TPU-native counterpart of the reference WN class (reference wn.py:21-135) --
the stationary/non-stationary wavenumber maps of Hoskins & Ambrizzi 1993 /
Hoskins & Yang 1996. The reference loops every grid point on host and, due to
an inverted None-check (wn.py:71-72: `if result is None:
self._solve_at_grid_point(...)`), never actually solves at valid points; the
clear intent (wn.py:74-87) is implemented here by construction: one fused
vectorized solve over the whole (nlon x nlat x nzwn) grid.

Also provides the NaN in-fill helpers (wn.py:93-128) as pure jnp; like the
reference, in-filling is NOT applied by default (wn.py:110: postprocess kept
out of the main flow for Fortran parity).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rwrt_tpu.models.basic_state import BasicState
from rwrt_tpu.ops import interp
from rwrt_tpu.ops.cubic import solve_dispersion_cubic
from rwrt_tpu.ops.groupvel import group_velocity


class WavenumberMaps(NamedTuple):
    """Gridded diagnostics, shapes (nlon, nlat, nzwn, 3) / (nlon, nlat, nzwn).

    Matches the reference WN array layout (wn.py:43-46).
    """

    mwn: jnp.ndarray      # meridional wavenumber roots
    rootnum: jnp.ndarray  # number of real propagating roots
    ug: jnp.ndarray       # zonal group velocity per root
    vg: jnp.ndarray       # meridional group velocity per root


@functools.partial(jax.jit, static_argnames=())
def _compute_points(fields, lon0, lat0, dx, dy, lon_pts, lat_pts, zwn, freq):
    """Flat per-point solve: (npts,) positions -> (npts, nzwn, 3) products.

    Every op is elementwise along the point axis, so under a mesh the point
    axis shards with no collectives (pure GSPMD partitioning; there is no
    while_loop here, unlike the adaptive integrator)."""
    f = interp.sample_mercator(fields, lon0, lat0, dx, dy, lon_pts, lat_pts)
    fmu, fmv = f[interp.M_U], f[interp.M_V]
    fmqx, fmqy = f[interp.M_QX], f[interp.M_QY]

    roots, count = solve_dispersion_cubic(
        fmu[:, None], fmv[:, None], fmqx[:, None], fmqy[:, None],
        freq, zwn[None, :],
    )  # (npts, nzwn, 3), (npts, nzwn)

    ug, vg = group_velocity(
        fmu[:, None, None], fmv[:, None, None],
        fmqx[:, None, None], fmqy[:, None, None],
        zwn[None, :, None], roots,
    )
    # Reference stores 0 group velocity for rootless slots (wn.py:87).
    dead = jnp.isnan(roots)
    ug = jnp.where(dead, 0.0, ug)
    vg = jnp.where(dead, 0.0, vg)
    return roots, count, ug, vg


def compute_wavenumber_maps(bs: BasicState, zwn, freq: float = 0.0, *,
                            mesh=None) -> WavenumberMaps:
    """Solve the dispersion relation at EVERY grid point x zonal wavenumber.

    mesh: optional ``jax.sharding.Mesh`` -- the flattened grid-point axis is
    sharded across its devices (background replicated, point axis padded to
    a multiple of the device count with NaN points); results are identical
    to the single-device solve up to codegen ULP wobble. The per-point work
    has no cross-point dependencies, so the compiled program contains no
    collectives (the implicit gather happens only when results are fetched).

    A time-varying BasicState (4-D field stack, prepare_time_varying) maps
    frame by frame: every product gains a leading time axis of length T.
    The reference WN class is static-only (wn.py:21-46).
    """
    if bs.fields.ndim == 4:
        frames = [
            compute_wavenumber_maps(
                bs._replace(fields=bs.fields[ti], betam=bs.betam[ti],
                            ks=bs.ks[ti], q=bs.q[ti]),
                zwn, freq, mesh=mesh)
            for ti in range(bs.fields.shape[0])
        ]
        return WavenumberMaps(*(jnp.stack(x) for x in zip(*frames)))
    dtype = bs.fields.dtype
    nlon, nlat = bs.lon.shape[0], bs.lat.shape[0]
    lon_pts = jnp.repeat(bs.lon.astype(dtype), nlat)
    lat_pts = jnp.tile(bs.lat.astype(dtype), nlon)
    scalars = (
        bs.lon[0].astype(dtype), bs.lat[0].astype(dtype),
        jnp.asarray(bs.dx, dtype), jnp.asarray(bs.dy, dtype),
    )
    zwn_d = jnp.asarray(zwn, dtype)
    freq_d = jnp.asarray(freq, dtype)
    npts = lon_pts.shape[0]
    fields = bs.fields
    if mesh is not None:
        from rwrt_tpu.parallel import sharding as sh

        n_shards = mesh.devices.size
        lon_pts, _ = sh.pad_rays(lon_pts, n_shards)
        lat_pts, _ = sh.pad_rays(lat_pts, n_shards)
        lon_pts = sh.shard_rays(lon_pts, mesh)
        lat_pts = sh.shard_rays(lat_pts, mesh)
        fields, scalars, zwn_d, freq_d = sh.replicate(
            (fields, scalars, zwn_d, freq_d), mesh)
    roots, count, ug, vg = _compute_points(
        fields, *scalars, lon_pts, lat_pts, zwn_d, freq_d)
    shape4 = (nlon, nlat, len(zwn), 3)
    return WavenumberMaps(
        mwn=roots[:npts].reshape(shape4),
        rootnum=count[:npts].reshape(shape4[:3]),
        ug=ug[:npts].reshape(shape4),
        vg=vg[:npts].reshape(shape4),
    )


def fill_nan_neighborhood_mean(arr: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    """Replace NaNs by the mean of valid neighbors in a size x size window
    over the leading two (lon, lat) axes, lon wrapping (reference
    fast_fill_nan, wn.py:93-108)."""
    mask = jnp.isnan(arr)
    filled0 = jnp.where(mask, 0.0, arr)
    weight = (~mask).astype(arr.dtype)
    half = size // 2

    def window_sum(x):
        total = jnp.zeros_like(x)
        for di in range(-half, half + 1):
            rolled = jnp.roll(x, di, axis=0)  # lon wraps
            for dj in range(-half, half + 1):
                shifted = jnp.roll(rolled, dj, axis=1)
                # lat edges: emulate uniform_filter 'wrap' used by the
                # reference (mode='wrap', wn.py:102-103)
                total = total + shifted
        return total

    s = window_sum(filled0)
    w = window_sum(weight)
    fill = s / jnp.where(w == 0.0, 1.0, w)
    fill = jnp.where(w == 0.0, jnp.nan, fill)
    return jnp.where(mask, fill, arr)


def postprocess_maps(maps: WavenumberMaps, size: int = 3) -> WavenumberMaps:
    """NaN-fill the map product by neighborhood means (reference
    WN.postprocess, wn.py:110-114: fills ug, vg, mwn; rootnum untouched).

    Like the reference, this is NOT applied inside compute_wavenumber_maps
    (the reference keeps postprocess out of the main flow for Fortran
    parity); callers opt in. Windows with zero valid neighbors stay NaN
    (the reference emits float-noise inf there -- see
    tests/test_diagnostics.py::test_fill_nan_matches_reference_fast_fill_nan).
    """
    return WavenumberMaps(
        mwn=fill_nan_neighborhood_mean(maps.mwn, size),
        rootnum=maps.rootnum,
        ug=fill_nan_neighborhood_mean(maps.ug, size),
        vg=fill_nan_neighborhood_mean(maps.vg, size),
    )


def turning_critical_masks(bs: BasicState, zwn) -> jnp.ndarray:
    """Turning/critical-latitude masks per zonal wavenumber.

    A wave with dimensionless wavenumber k can propagate where Ks > k
    (critical latitude where u -> 0 => Ks -> inf is never masked; turning
    latitude where Ks == k). Returns bool (nlon, nlat, nzwn): True where
    propagation is allowed. (BASELINE.json config 3.)
    """
    ks = bs.ks[..., None]
    k = jnp.asarray(zwn)[None, None, :]
    return jnp.isfinite(ks) & (ks > k)
