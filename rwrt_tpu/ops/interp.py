"""Batched bilinear sampling of the background-field stack at ray positions.

This is the inner-loop workhorse: every RHS evaluation gathers all 18
background fields at every ray position and applies the Mercator coordinate
transform. TPU-native equivalents of:

- ``batch_linint2_metpy(mode='numpy')`` + ``bilinear_interpolation_``
  (reference interpolation.py:37-135): fractional grid indices, floor+clip,
  4-corner gather, bilinear weights. Cyclicity is handled upstream by the wrap
  column appended to the field stack (reference bs.py:370-372), so plain
  clipping is exact for lon in [lon[0], lon[0] + 2*pi).
- ``BS.cal_bs_mercator_point(mode='numpy')`` (reference bs.py:781-887): the
  Mercator transform block with the polar-cap guard |cos(lat)| <= 0.0175.

Design notes (TPU): the gather is expressed as 4 row-gathers from the stack
flattened to (nlon_wrap * nlat, 18) so each gathered row is one contiguous
18-vector; XLA lowers this to dynamic-gather over the leading axis. NaN
positions (dead rays) propagate naturally: floor(NaN) -> NaN weights -> NaN
outputs, with indices clipped into range so the gather itself is safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rwrt_tpu.constants import pi, polar_cos_cap

# Indices into the raw 18-field stack (models/basic_state.py FIELD_NAMES).
(F_U, F_V, F_UX, F_UY, F_VX, F_VY, F_QX, F_QY, F_QXX, F_QXY, F_QYX, F_QYY,
 F_QXXX, F_QXXY, F_QXYY, F_QYYY, F_QYXX, F_QYYX) = range(18)

# Indices into the Mercator-transformed sample, matching the reference's
# 18-tuple return order (reference bs.py:885-887).
(M_U, M_V, M_UX, M_UY, M_VX, M_VY, M_QX, M_QY, M_QXX, M_QXY, M_QYX, M_QYY,
 M_QXXX, M_QXXY, M_QXYY, M_QYYY, M_QYXX, M_QYYX) = range(18)

#: The ray RHS consumes only the first 12 Mercator fields (positions 0..11 of
#: both the raw stack and the transformed output); the third derivatives are
#: diagnostic-only (the reference interpolates all 18 every RHS evaluation,
#: wr.py:521-539, and then discards the last 6 -- we gather only the hot 12).
NUM_HOT = 12


def bilinear_gather(fields: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """4-corner bilinear gather at fractional grid indices.

    Args:
      fields: (W, H, C) field stack (W includes the cyclic wrap column).
      x, y: (R,) fractional indices into the W / H axes.

    Returns:
      (R, C) interpolated values. Matches reference
      interpolation.py:103-135 exactly, including the quirk that the
      interpolation weights are computed against the CLIPPED corner indices
      (so out-of-range points extrapolate rather than clamp).
    """
    w, h, _ = fields.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)

    sx = x - x0.astype(x.dtype)
    sy = y - y0.astype(y.dtype)

    flat = fields.reshape(w * h, -1)
    fa = jnp.take(flat, x0 * h + y1, axis=0)  # (R, C) upper-left
    fb = jnp.take(flat, x1 * h + y1, axis=0)  # upper-right
    fc = jnp.take(flat, x0 * h + y0, axis=0)  # lower-left
    fd = jnp.take(flat, x1 * h + y0, axis=0)  # lower-right

    wa = ((1.0 - sx) * sy)[:, None]
    wb = (sx * sy)[:, None]
    wc = ((1.0 - sx) * (1.0 - sy))[:, None]
    wd = (sx * (1.0 - sy))[:, None]
    return fa * wa + fb * wb + fc * wc + fd * wd


def bilinear_gather_masked(
    fields: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
    *, fallback_mean: bool = False,
) -> jnp.ndarray:
    """Bilinear gather with missing-value (NaN) corner handling.

    Counterpart of the reference's scalar linint2_point missing-value logic
    (interpolation.py:325-339): if any of the 4 corners is missing, the
    result is missing -- unless ``fallback_mean`` (the reference's nopt=-1),
    in which case the plain mean of the valid corners is returned. The main
    pipeline never hits this (background fields are complete); it exists for
    gappy observational inputs.
    """
    w, h, _ = fields.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    sx = (x - x0.astype(x.dtype))[:, None]
    sy = (y - y0.astype(y.dtype))[:, None]

    flat = fields.reshape(w * h, -1)
    corners = [
        jnp.take(flat, x0 * h + y1, axis=0),
        jnp.take(flat, x1 * h + y1, axis=0),
        jnp.take(flat, x0 * h + y0, axis=0),
        jnp.take(flat, x1 * h + y0, axis=0),
    ]
    weights = [(1.0 - sx) * sy, sx * sy, (1.0 - sx) * (1.0 - sy),
               sx * (1.0 - sy)]
    interp_val = sum(c * wgt for c, wgt in zip(corners, weights))
    any_missing = sum(jnp.isnan(c) for c in corners) > 0
    if not fallback_mean:
        return jnp.where(any_missing, jnp.nan, interp_val)
    valid = [~jnp.isnan(c) for c in corners]
    n_valid = sum(v.astype(interp_val.dtype) for v in valid)
    mean_val = sum(jnp.where(v, c, 0.0) for c, v in zip(corners, valid)) / (
        jnp.maximum(n_valid, 1.0)
    )
    mean_val = jnp.where(n_valid == 0, jnp.nan, mean_val)
    return jnp.where(any_missing, mean_val, interp_val)


def linint2_point(xi, yi, fi, xo, yo, *, xcyclic=True,
                  fo_missing=jnp.nan, nopt=1) -> jnp.ndarray:
    """General bilinear point interpolation on MONOTONIC (possibly
    non-uniform) axes -- the vectorized counterpart of the reference's
    scalar linint2_point (reference interpolation.py:251-351), semantics
    preserved exactly:

    - x-cyclic handling via the reference's period convention
      period = (xi[-1] - xi[0]) + (xi[1] - xi[0]) and one extension column
      on each side (interpolation.py:283-299);
    - interval lookup by searchsorted - 1, clamped (interpolation.py:306-323);
    - out-of-range points return fo_missing (y always; x when not cyclic);
    - missing corners are detected by EQUALITY with fo_missing
      (interpolation.py:330-334) -- note this matches the reference, where a
      NaN sentinel therefore never triggers the missing branch and simply
      propagates through the arithmetic; nopt == -1 substitutes the plain
      mean of the non-missing corners (the docstring's "distance-weighted"
      fallback is a mean in the reference too, interpolation.py:336-338);
    - the two-step lerp formula (f11 + t*(f21 - f11), then in y) is kept for
      bit-level parity with the reference's rounding.

    The HOT path does not use this (uniform global grids take the
    fractional-index fast path, like the reference's own batched dialect);
    this is the diagnostic-grade sampler for arbitrary monotonic grids.

    Args:
      xi: (nx,) ascending x coordinates; yi: (ny,) ascending y coordinates.
      fi: (nx, ny) field.
      xo, yo: (R,) query points.

    Returns:
      (R,) interpolated values.
    """
    xi = jnp.asarray(xi)
    yi = jnp.asarray(yi)
    fi = jnp.asarray(fi)
    xo = jnp.asarray(xo)
    yo = jnp.asarray(yo)

    if xcyclic:
        dx0 = xi[1] - xi[0]
        period = (xi[-1] - xi[0]) + dx0
        xo = ((xo - xi[0]) % period) + xi[0]
        xi_use = jnp.concatenate([xi[:1] - dx0, xi, xi[-1:] + dx0])
        fi_use = jnp.concatenate([fi[-1:], fi, fi[:1]], axis=0)
    else:
        xi_use = xi
        fi_use = fi

    x_oob = (xo < xi_use[0]) | (xo > xi_use[-1])
    y_oob = (yo < yi[0]) | (yo > yi[-1])

    nx = jnp.clip(jnp.searchsorted(xi_use, xo) - 1, 0, xi_use.shape[0] - 2)
    ny = jnp.clip(jnp.searchsorted(yi, yo) - 1, 0, yi.shape[0] - 2)

    f11 = fi_use[nx, ny]
    f21 = fi_use[nx + 1, ny]
    f12 = fi_use[nx, ny + 1]
    f22 = fi_use[nx + 1, ny + 1]

    t = (xo - xi_use[nx]) / (xi_use[nx + 1] - xi_use[nx])
    u = (yo - yi[ny]) / (yi[ny + 1] - yi[ny])
    f_low = f11 + t * (f21 - f11)
    f_high = f12 + t * (f22 - f12)
    fo = f_low + u * (f_high - f_low)

    corners = (f11, f21, f12, f22)
    miss = sum((c == fo_missing for c in corners), start=jnp.zeros_like(fo,
                                                                        bool))
    any_missing = miss > 0
    if nopt == -1:
        valid = [(c != fo_missing) for c in corners]
        n_valid = sum(v.astype(fo.dtype) for v in valid)
        mean_val = sum(jnp.where(v, c, 0.0) for c, v in zip(corners, valid))
        mean_val = jnp.where(n_valid > 0, mean_val / jnp.maximum(n_valid, 1.0),
                             fo_missing)
        fo = jnp.where(any_missing, mean_val, fo)
    else:
        fo = jnp.where(any_missing, fo_missing, fo)
    return jnp.where(x_oob | y_oob, fo_missing, fo)


def sample_raw(bs_fields, lon0, lat0, dx, dy, lon, lat) -> jnp.ndarray:
    """Interpolate the raw 18-field stack at (lon, lat) points.

    Mirrors reference batch_linint2_metpy numpy mode
    (interpolation.py:78-85): lon wrapped mod 2*pi, converted to fractional
    indices relative to the grid origin. Points with |lat| > pi/2 return NaN
    rows (reference bs.py:787, 822-836).

    Returns (R, 18).
    """
    # (lon - lon0) mod 2*pi, NOT (lon mod 2*pi) - lon0: the latter sends
    # points west of the grid origin past the last column whenever
    # lon0 != 0 (e.g. a -180..180 input grid), where the clipped-corner
    # extrapolation produces silently wrong samples. Bit-identical for
    # lon0 == 0 (every reference grid).
    ix = ((lon - lon0) % (2.0 * pi)) / dx
    iy = (lat - lat0) / dy
    vals = bilinear_gather(bs_fields, ix, iy)
    in_range = jnp.abs(lat) <= 0.5 * pi
    return jnp.where(in_range[:, None], vals, jnp.nan)


def mercator_transform(raw: jnp.ndarray, lat: jnp.ndarray) -> jnp.ndarray:
    """Convert raw interpolated fields to Mercator coordinates.

    Exact vectorization of reference bs.py:856-887:
      - polar-cap mask: everything is zeroed where |cos(lat)| <= 0.0175. The
        mask is computed as NOT(|cos| <= cap) so NaN latitudes stay UNmasked
        and propagate NaN (matching the reference's `mask[|cos|<=cap]=0`).
      - fmuy = fuy + tan(lat)*fu (the "Fortran kept it" convention, reference
        bs.py:750-752: the formula would divide by cos but the Fortran code
        does not, and the reference preserves that).
      - both fmqxy and fmqyx derive from the SMOOTHED qxy sample (stack index
        9); the unsmoothed qyx sample (index 10) is interpolated but unused,
        exactly as in the reference.

    Args:
      raw: (R, 18) from sample_raw.
      lat: (R,) latitudes in radians.

    Returns:
      (18, R) transformed fields in M_* order.
    """
    cos_phi = jnp.cos(lat)
    sin_phi = jnp.sin(lat)
    live = jnp.logical_not(jnp.abs(cos_phi) <= polar_cos_cap)
    # Reference substitutes 1e-6 for the masked cos before dividing
    # (bs.py:860); results there are zeroed anyway.
    cosm = jnp.where(live, cos_phi, 1e-6)
    tan_phi = sin_phi / cosm

    f = raw.T  # (C, R), C = 12 (hot) or 18 (full)
    full = raw.shape[-1] > NUM_HOT
    zero = jnp.zeros_like(cos_phi)

    def m(expr):
        return jnp.where(live, expr, zero)

    fmqyx = m(f[F_QXY] * cosm)
    out = [None] * (18 if full else NUM_HOT)
    out[M_U] = m(f[F_U] / cosm)
    out[M_V] = m(f[F_V] / cosm)
    out[M_UX] = m(f[F_UX] / cosm)
    out[M_UY] = m(f[F_UY] + tan_phi * f[F_U])
    out[M_VX] = m(f[F_VX] / cosm)
    out[M_VY] = m(f[F_VY] + tan_phi * f[F_V])
    out[M_QX] = m(f[F_QX])
    out[M_QY] = m(f[F_QY] * cosm)
    out[M_QXX] = m(f[F_QXX])
    out[M_QXY] = fmqyx
    out[M_QYX] = fmqyx
    out[M_QYY] = m((f[F_QYY] * cosm - f[F_QY] * sin_phi) * cosm)
    if full:
        out[M_QXXX] = m(f[F_QXXX])
        out[M_QXXY] = m(f[F_QXXY] * cosm)
        out[M_QXYY] = m((f[F_QXYY] * cosm - f[F_QXY] * sin_phi) * cosm)
        out[M_QYYY] = m(f[F_QYYY])
        out[M_QYXX] = m(f[F_QYXX] * cosm)
        out[M_QYYX] = m((f[F_QYYX] * cosm - f[F_QXY] * sin_phi) * cosm)
    return jnp.stack(out, axis=0)


def sample_mercator(bs_fields, lon0, lat0, dx, dy, lon, lat) -> jnp.ndarray:
    """Interpolate + Mercator-transform in one fused call.

    Equivalent of reference BS.cal_bs_mercator_point(mode='numpy')
    (bs.py:781-887). Returns (18, R) in M_* order.
    """
    raw = sample_raw(bs_fields, lon0, lat0, dx, dy, lon, lat)
    return mercator_transform(raw, lat)


def pack_corners(fields: jnp.ndarray) -> jnp.ndarray:
    """Pack each cell's 2x2 corner neighborhood into one row.

    TPU performance: XLA lowers row gathers to per-row scalar-core work, so
    cost scales with row COUNT; packing the four bilinear corners into one
    (W, H, 4C) row turns 4 gathers per ray per evaluation into 1. The +1
    neighbors are clamped at the array edges exactly as the 4-gather path
    clamps its indices (reference interpolation.py:116-119), so results are
    bit-identical.

    Layout per row: [F(w,h), F(w+1,h), F(w,h+1), F(w+1,h+1)].
    Accepts (W, H, C) or time-varying (T, W, H, C).
    """

    def shift(f, axis):
        n = f.shape[axis]
        lead = jax.lax.slice_in_dim(f, 1, n, axis=axis)
        last = jax.lax.slice_in_dim(f, n - 1, n, axis=axis)
        return jnp.concatenate([lead, last], axis=axis)

    right = shift(fields, -3)
    up = shift(fields, -2)
    right_up = shift(right, -2)
    return jnp.concatenate([fields, right, up, right_up], axis=-1)


def _packed_cell(w, h, lon0, lat0, dx, dy, lon, lat):
    """Fractional-index cell decomposition shared by every packed sampler:
    clamped (x0, y0) cell plus the bilinear offsets (sx, sy)."""
    # (lon - lon0) mod 2*pi, NOT (lon mod 2*pi) - lon0: the latter sends
    # points west of the grid origin past the last column whenever
    # lon0 != 0 (e.g. a -180..180 input grid), where the clipped-corner
    # extrapolation produces silently wrong samples. Bit-identical for
    # lon0 == 0 (every reference grid).
    ix = ((lon - lon0) % (2.0 * pi)) / dx
    iy = (lat - lat0) / dy
    x0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), 0, h - 1)
    sx = ix - x0.astype(ix.dtype)
    sy = iy - y0.astype(iy.dtype)
    return x0, y0, sx, sy


def _packed_corner_lerp(flat, row_idx, sx, sy, c):
    """ONE row gather + the bilinear corner combination -- the single copy
    of the weight expression and summation order whose bit-identity (to the
    unpacked 4-gather path, and across the member/time variants) is
    load-bearing for the golden and ensemble-equality tests.

    ``.at[].get(mode='promise_in_bounds')`` skips the bounds-handling
    gather path (row indices are built from clamped cell coordinates).
    """
    rows = flat.at[row_idx].get(mode="promise_in_bounds")
    fc = rows[:, 0:c]            # (x0, y0)
    fd = rows[:, c : 2 * c]      # (x1, y0)
    fa = rows[:, 2 * c : 3 * c]  # (x0, y1)
    fb = rows[:, 3 * c : 4 * c]  # (x1, y1)
    wa = ((1.0 - sx) * sy)[:, None]
    wb = (sx * sy)[:, None]
    wc = ((1.0 - sx) * (1.0 - sy))[:, None]
    wd = (sx * (1.0 - sy))[:, None]
    return fa * wa + fb * wb + fc * wc + fd * wd


def sample_raw_packed(packed, lon0, lat0, dx, dy, lon, lat) -> jnp.ndarray:
    """Bilinear sample from a corner-packed stack: ONE row gather per point.

    Bit-identical to sample_raw on the unpacked stack (same clamped corner
    values, same weight expression and summation order).
    """
    w, h, c4 = packed.shape
    c = c4 // 4
    x0, y0, sx, sy = _packed_cell(w, h, lon0, lat0, dx, dy, lon, lat)
    vals = _packed_corner_lerp(
        packed.reshape(w * h, c4), x0 * h + y0, sx, sy, c)
    in_range = jnp.abs(lat) <= 0.5 * pi
    return jnp.where(in_range[:, None], vals, jnp.nan)


def sample_mercator_packed(packed, lon0, lat0, dx, dy, lon, lat):
    """Corner-packed sample + Mercator transform; returns (C, R)."""
    raw = sample_raw_packed(packed, lon0, lat0, dx, dy, lon, lat)
    return mercator_transform(raw, lat)


def sample_raw_packed_member(packed, lon0, lat0, dx, dy, lon, lat, member):
    """Ensemble variant of sample_raw_packed: per-lane member selection.

    packed: (M, W, H, 4C) corner-packed stacks, one per ensemble member;
    member: (R,) int32 lane -> member index. The member axis folds into the
    gathered row index (one extra add), so per-lane cost is identical to the
    single-member path and results are bit-identical per member. This is how
    ensemble sweeps (BASELINE.json config 5) ride the SAME group-asynchronous
    adaptive controller as single runs: members become extra lanes, whose
    progress is already decoupled per lane.
    """
    m, w, h, c4 = packed.shape
    c = c4 // 4
    x0, y0, sx, sy = _packed_cell(w, h, lon0, lat0, dx, dy, lon, lat)
    vals = _packed_corner_lerp(
        packed.reshape(m * w * h, c4), member * (w * h) + x0 * h + y0,
        sx, sy, c)
    in_range = jnp.abs(lat) <= 0.5 * pi
    return jnp.where(in_range[:, None], vals, jnp.nan)


def sample_raw_packed_member_time(packed, lon0, lat0, dx, dy, lon, lat,
                                  member, tfrac):
    """Time-varying ensemble variant: per-lane member AND time selection.

    packed: (M, T, W, H, 4C) corner-packed stacks (one time sequence per
    member); member: (R,) int32 lane -> member index; tfrac: (R,) fractional
    frame index. Two row gathers per lane (one per bracketing frame) with
    the member offset folded into the row index -- the same cost as the
    single-member time-varying path (sample_raw_packed_time), to which this
    is bit-identical per member.
    """
    m, nt, w, h, c4 = packed.shape
    c = c4 // 4
    tf = jnp.clip(tfrac, 0.0, nt - 1.0)
    i0 = jnp.clip(jnp.floor(tf).astype(jnp.int32), 0, nt - 1)
    i1 = jnp.clip(i0 + 1, 0, nt - 1)
    w1 = tf - i0.astype(tf.dtype)

    x0, y0, sx, sy = _packed_cell(w, h, lon0, lat0, dx, dy, lon, lat)
    flat = packed.reshape(m * nt * w * h, c4)
    cell = member * (nt * w * h) + x0 * h + y0

    def frame(ti):
        return _packed_corner_lerp(flat, ti * (w * h) + cell, sx, sy, c)

    vals = frame(i0) * (1.0 - w1)[:, None] + frame(i1) * w1[:, None]
    in_range = jnp.abs(lat) <= 0.5 * pi
    return jnp.where(in_range[:, None], vals, jnp.nan)


def sample_raw_time(bs_fields, lon0, lat0, dx, dy, lon, lat, tfrac) -> jnp.ndarray:
    """Time-varying variant: bs_fields (T, W, H, C), tfrac (R,) fractional
    frame index (clamped to the ends). Linear interpolation in time of the
    field stack -- exact, since every precomputed field is linear in (u, v).

    No reference counterpart (the reference background is static); this
    implements BASELINE.json config 4 (time-varying backgrounds).
    """
    nt = bs_fields.shape[0]
    tf = jnp.clip(tfrac, 0.0, nt - 1.0)
    i0 = jnp.clip(jnp.floor(tf).astype(jnp.int32), 0, nt - 1)
    i1 = jnp.clip(i0 + 1, 0, nt - 1)
    w1 = tf - i0.astype(tf.dtype)

    # (lon - lon0) mod 2*pi, NOT (lon mod 2*pi) - lon0: the latter sends
    # points west of the grid origin past the last column whenever
    # lon0 != 0 (e.g. a -180..180 input grid), where the clipped-corner
    # extrapolation produces silently wrong samples. Bit-identical for
    # lon0 == 0 (every reference grid).
    ix = ((lon - lon0) % (2.0 * pi)) / dx
    iy = (lat - lat0) / dy

    _, w, h, _ = bs_fields.shape
    x0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    sx = ix - x0.astype(ix.dtype)
    sy = iy - y0.astype(iy.dtype)

    flat = bs_fields.reshape(nt * w * h, -1)

    def corner(ti, xi, yi):
        return jnp.take(flat, (ti * w + xi) * h + yi, axis=0)

    def frame(ti):
        fa = corner(ti, x0, y1)
        fb = corner(ti, x1, y1)
        fc = corner(ti, x0, y0)
        fd = corner(ti, x1, y0)
        wa = ((1.0 - sx) * sy)[:, None]
        wb = (sx * sy)[:, None]
        wc = ((1.0 - sx) * (1.0 - sy))[:, None]
        wd = (sx * (1.0 - sy))[:, None]
        return fa * wa + fb * wb + fc * wc + fd * wd

    vals = frame(i0) * (1.0 - w1)[:, None] + frame(i1) * w1[:, None]
    in_range = jnp.abs(lat) <= 0.5 * pi
    return jnp.where(in_range[:, None], vals, jnp.nan)


def sample_mercator_time(bs_fields, lon0, lat0, dx, dy, lon, lat, tfrac):
    """Time-varying sample + Mercator transform; returns (18, R)."""
    raw = sample_raw_time(bs_fields, lon0, lat0, dx, dy, lon, lat, tfrac)
    return mercator_transform(raw, lat)


def sample_raw_packed_time(packed, lon0, lat0, dx, dy, lon, lat, tfrac):
    """Time-varying corner-packed sample: 2 row gathers (one per bracketing
    frame) + linear time interpolation. packed: (T, W, H, 4C)."""
    nt, w, h, c4 = packed.shape
    c = c4 // 4
    tf = jnp.clip(tfrac, 0.0, nt - 1.0)
    i0 = jnp.clip(jnp.floor(tf).astype(jnp.int32), 0, nt - 1)
    i1 = jnp.clip(i0 + 1, 0, nt - 1)
    w1 = tf - i0.astype(tf.dtype)

    x0, y0, sx, sy = _packed_cell(w, h, lon0, lat0, dx, dy, lon, lat)
    flat = packed.reshape(nt * w * h, c4)
    cell = x0 * h + y0

    def frame(ti):
        return _packed_corner_lerp(flat, ti * (w * h) + cell, sx, sy, c)

    vals = frame(i0) * (1.0 - w1)[:, None] + frame(i1) * w1[:, None]
    in_range = jnp.abs(lat) <= 0.5 * pi
    return jnp.where(in_range[:, None], vals, jnp.nan)
