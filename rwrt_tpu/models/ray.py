"""Ray ODE right-hand side and termination physics.

TPU-native counterpart of the reference's diffun machinery (reference
wr.py:44-82 core_diffun, wr.py:492-556 diffun_numpy) and the per-ray failure
masks. One dialect: pure jnp over a flat ray batch (R,), jit/vmap/shard-map
friendly; dead rays are NaN lanes, never control flow.

State layout: 5 prognostic variables per ray, stacked as a (5, R) array
[lon, lat, kx, ky, amp] (the reference's slots 5:7 -- ug, vg -- are
diagnostics recomputed from the dispersion relation after every step,
wr.py:737-746, so they are not carried in the state).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from rwrt_tpu.constants import mwn_cap, pi, rearth
from rwrt_tpu.ops import groupvel as groupvel_mod
from rwrt_tpu.ops import interp
from rwrt_tpu.ops.groupvel import group_velocity

# State variable indices.
S_LON, S_LAT, S_KX, S_KY, S_AMP = range(5)
NUM_VARS = 5


class Background(NamedTuple):
    """Per-run inputs to the RHS (a closure-free pytree).

    fields: (nlon_wrap, nlat, 18) stacked background (BasicState.fields), or
        (T, nlon_wrap, nlat, 18) for a time-varying background (linear time
        interpolation of the stack; BASELINE.json config 4).
    lon0, lat0: grid origin in radians.
    dx, dy: grid spacing in radians.
    freq: wave frequency (rad/s).
    bg_t0, bg_dt: time of frame 0 and frame spacing in seconds (used only
        when fields is 4-D).
    """

    fields: jnp.ndarray
    lon0: jnp.ndarray
    lat0: jnp.ndarray
    dx: jnp.ndarray
    dy: jnp.ndarray
    freq: jnp.ndarray
    bg_t0: jnp.ndarray = jnp.float32(0.0)
    bg_dt: jnp.ndarray = jnp.float32(1.0)
    # Ensemble sweeps: fields is (M, W, H, 4C) (one packed stack per member)
    # and member_ids (R,) maps each ray lane to its member. None for single
    # backgrounds. See interp.sample_raw_packed_member.
    member_ids: Optional[jnp.ndarray] = None

    @property
    def time_varying(self) -> bool:
        return self.fields.ndim == 4 and self.member_ids is None


def sample_bg(bg: "Background", lon, lat, t):
    """Sample the (possibly time-varying) Mercator background at positions.

    Backgrounds built by tracer.make_background carry a corner-PACKED hot
    stack (last dim 4 * NUM_HOT; see interp.pack_corners) for single-gather
    sampling; unpacked stacks are also accepted for direct/diagnostic use.
    """
    packed = bg.fields.shape[-1] == 4 * interp.NUM_HOT
    if bg.member_ids is not None:
        # Ensemble lanes: per-lane member row offset into the stacked packed
        # fields. Calls over flattened (k*R,) positions (e.g. the grouped
        # history re-derivation) tile the lane->member map.
        member = bg.member_ids
        if member.shape[0] != lon.shape[0]:
            reps = lon.shape[0] // member.shape[0]
            member = jnp.tile(member, reps)
        if bg.fields.ndim == 5:
            # Time-varying members: (M, T, W, H, 4C) stacks, per-lane
            # member offset + per-lane time lerp in one gather expression.
            tfrac = (t - bg.bg_t0) / bg.bg_dt
            tfrac = jnp.broadcast_to(jnp.asarray(tfrac, lon.dtype),
                                     lon.shape)
            raw = interp.sample_raw_packed_member_time(
                bg.fields, bg.lon0, bg.lat0, bg.dx, bg.dy, lon, lat,
                member, tfrac
            )
            return interp.mercator_transform(raw, lat)
        raw = interp.sample_raw_packed_member(
            bg.fields, bg.lon0, bg.lat0, bg.dx, bg.dy, lon, lat, member
        )
        return interp.mercator_transform(raw, lat)
    if bg.fields.ndim == 4:
        tfrac = (t - bg.bg_t0) / bg.bg_dt
        tfrac = jnp.broadcast_to(jnp.asarray(tfrac, lon.dtype), lon.shape)
        if packed:
            raw = interp.sample_raw_packed_time(
                bg.fields, bg.lon0, bg.lat0, bg.dx, bg.dy, lon, lat, tfrac
            )
            return interp.mercator_transform(raw, lat)
        return interp.sample_mercator_time(
            bg.fields, bg.lon0, bg.lat0, bg.dx, bg.dy, lon, lat, tfrac
        )
    if packed:
        return interp.sample_mercator_packed(
            bg.fields, bg.lon0, bg.lat0, bg.dx, bg.dy, lon, lat
        )
    return interp.sample_mercator(
        bg.fields, bg.lon0, bg.lat0, bg.dx, bg.dy, lon, lat
    )


def fail_mask(y: jnp.ndarray) -> jnp.ndarray:
    """Per-ray failure mask evaluated on a state (reference wr.py:508-514).

    True where |lat| >= pi/2 or |ky| >= 100. NaN states compare False on both
    (matching numpy semantics) so already-dead rays are NOT flagged here; they
    propagate NaN through the arithmetic instead.
    """
    return (jnp.abs(y[S_LAT]) >= 0.5 * pi) | (jnp.abs(y[S_KY]) >= mwn_cap)


def rhs(bg: Background, y: jnp.ndarray, t=0.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """dy/dt for the ray batch.

    Mirrors reference diffun_numpy (wr.py:492-556) + core_diffun
    (wr.py:44-82):

      dlon/dt = ug / R
      dlat/dt = vg cos(lat) / R
      dk/dt   = -k [(fmux + kap fmvx) + (kap fmqxx - fmqyx)/K^2] / R
      dl/dt   = -k [(fmuy + kap fmvy) + (kap fmqxy - fmqyy)/K^2] / R
      damp/dt = amp [2(fmux + fmvy + kap(fmvx + fmuy))/(1+kap^2)
                     + 2(kap(fmqxx - fmqyy) + (kap^2-1) fmqxy)/(K^2(1+kap^2))
                     - 2 sin(lat) fmv] / R

    Args:
      bg: background pytree.
      y: (5, R) state.

    Returns:
      (dy (5, R), err (R,) bool): err flags rays whose derivatives were forced
      NaN this evaluation (|lat| or |ky| out of bounds, wr.py:508-514).
    """
    dy, err, _, _ = _rhs_core(bg, y, t, False)
    return dy, err


def rhs_and_gv(bg: Background, y: jnp.ndarray, t=0.0):
    """rhs plus the diagnostic (ug, vg) of the evaluated state, computed from
    the SAME background sample.

    The (ug, vg) here are exactly what ``group_velocity_at`` would return at
    (lon, lat, kx, ky, t) -- raw ky, not the err-masked ky the derivatives
    use -- so the per-step output re-derivation (reference wr.py:737-746) can
    reuse the 7th-stage sample instead of paying a second gather pass.

    Returns (dy (5, R), ug (R,), vg (R,)).
    """
    dy, _, ug, vg = _rhs_core(bg, y, t, True)
    return dy, ug, vg


def _rhs_core(bg: Background, y: jnp.ndarray, t, with_raw_gv: bool):
    # Mixed precision (RunConfig.state_dtype='float64'): the integrated
    # state may be carried wider than the background. The SAMPLE and the
    # RHS algebra stay in the background's compute dtype -- that is the
    # whole point (throughput path f32; only the state accumulation and the
    # controller run wide) -- so cast at entry. No-op when dtypes match.
    cdtype = bg.fields.dtype
    if y.dtype != cdtype:
        y = y.astype(cdtype)
        t = jnp.asarray(t).astype(cdtype)
    lon, lat, kx, ky, amp = y[S_LON], y[S_LAT], y[S_KX], y[S_KY], y[S_AMP]

    err = fail_mask(y)

    # Autodiff hygiene (primal-identical): every NaN the reference
    # semantics call for is applied as a FINAL constant-branch where over
    # values computed from NaN-free substitutes, never by letting NaN flow
    # through the arithmetic. NaN intermediates have NaN partials, and a
    # zero cotangent times a NaN partial is NaN -- without this, one dead
    # lane poisons the shared background-field gradient through the
    # gather's scatter-add, and the pipeline stops being differentiable
    # (tests/test_autodiff.py). Live lanes see bit-identical inputs.
    # NaN lon/lat poison the background sample (every row); NaN kx/ky poison
    # kap and (ug, vg) (every row). NaN amp poisons ONLY damp/dt = amp*(...)
    # -- the reference's IEEE propagation keeps rows 0-3 finite and the ray
    # advancing until the next interval entry freezes it (wr.py:44-82 via
    # rkf45.py:400-403), so amp must NOT be in the all-row kill set.
    dead = (jnp.isnan(lon) | jnp.isnan(lat) | jnp.isnan(kx)
            | jnp.isnan(ky))
    ampn = jnp.isnan(amp)
    bad = err | dead  # lanes whose dy rows are all NaN by construction
    lon_q = jnp.where(dead, 0.0, lon)
    lat_q = jnp.where(dead, 0.0, lat)
    kx_q = jnp.where(bad, 1.0, kx)
    ky_q = jnp.where(bad, 0.0, ky)
    amp_q = jnp.where(ampn, 0.0, amp)

    # Sample at sanitized positions: dead lanes read grid cell (0, 0); their
    # rows are overwritten below. Live lanes (err included -- their
    # positions are finite) sample exactly where they always did.
    f = sample_bg(bg, lon_q, lat_q, t)
    fn = jnp.isnan(f)
    f_q = jnp.where(fn, 0.0, f)
    fmu, fmv = f_q[interp.M_U], f_q[interp.M_V]
    fmux, fmuy = f_q[interp.M_UX], f_q[interp.M_UY]
    fmvx, fmvy = f_q[interp.M_VX], f_q[interp.M_VY]
    fmqx, fmqy = f_q[interp.M_QX], f_q[interp.M_QY]
    fmqxx, fmqxy = f_q[interp.M_QXX], f_q[interp.M_QXY]
    fmqyx, fmqyy = f_q[interp.M_QYX], f_q[interp.M_QYY]
    n_u, n_v = fn[interp.M_U], fn[interp.M_V]
    n_qx, n_qy = fn[interp.M_QX], fn[interp.M_QY]

    ug, vg, _, _ = groupvel_mod.group_velocity_core(
        fmu, fmv, fmqx, fmqy, kx_q, ky_q)

    kap = ky_q / kx_q
    kap2 = kap * kap
    kap1 = 1.0 + kap2
    kk = kx_q * kx_q * kap1  # K^2 = k^2 + m^2

    dzwn = -kx_q * ((fmux + kap * fmvx) + (kap * fmqxx - fmqyx) / kk)
    dmwn = -kx_q * ((fmuy + kap * fmvy) + (kap * fmqxy - fmqyy) / kk)

    damp1 = 2.0 * (fmux + fmvy + kap * (fmvx + fmuy)) / kap1
    damp2 = 2.0 * (kap * (fmqxx - fmqyy) + (kap2 - 1.0) * fmqxy) / (kk * kap1)
    damp3 = -2.0 * jnp.sin(lat_q) * fmv
    damp = damp1 + damp2 + damp3

    # Per-row NaN sets = exact IEEE propagation of the original expressions
    # (err lanes forced whole-row NaN, wr.py:508-514; any finite kap keeps a
    # NaN field term NaN since 0 * NaN = NaN).
    r0n = bad | n_u | n_qx | n_qy
    r1n = bad | n_v | n_qx | n_qy
    r2n = bad | fn[interp.M_UX] | fn[interp.M_VX] | fn[interp.M_QXX] | fn[interp.M_QYX]
    r3n = bad | fn[interp.M_UY] | fn[interp.M_VY] | fn[interp.M_QXY] | fn[interp.M_QYY]
    r4n = (bad | ampn | fn[interp.M_UX] | fn[interp.M_UY] | fn[interp.M_VX]
           | fn[interp.M_VY] | fn[interp.M_QXX] | fn[interp.M_QXY]
           | fn[interp.M_QYY] | n_v)

    inv_r = 1.0 / rearth
    nan = jnp.asarray(jnp.nan, y.dtype)
    dy = jnp.stack(
        [
            jnp.where(r0n, nan, ug * inv_r),
            jnp.where(r1n, nan, vg * jnp.cos(lat_q) * inv_r),
            jnp.where(r2n, nan, dzwn * inv_r),
            jnp.where(r3n, nan, dmwn * inv_r),
            jnp.where(r4n, nan, damp * amp_q * inv_r),
        ]
    )
    if with_raw_gv:
        # Raw semantics: err-by-|ky| lanes keep their real ky (finite group
        # velocity); dead lanes and NaN-field samples are NaN. Uses the
        # SAME public group_velocity call graph as group_velocity_at (raw
        # sampled fields, raw wavenumbers -- it sanitizes internally) so
        # the grouped runner's fused stage-7 (ug, vg) compile to the
        # bit-identical expression the barrier path's post-pass uses
        # (tests assert atol=0 equality between the two).
        ug_r, vg_r = group_velocity(
            f[interp.M_U], f[interp.M_V], f[interp.M_QX], f[interp.M_QY],
            kx, ky)
        ug_raw = jnp.where(dead, nan, ug_r)
        vg_raw = jnp.where(dead, nan, vg_r)
        return dy, err, ug_raw, vg_raw
    return dy, err, None, None


def group_velocity_at(bg: Background, lon, lat, kx, ky, t=0.0, *,
                      zero_invalid=False):
    """Diagnostic (ug, vg) at given positions/wavenumbers.

    Used to (re)derive the output slots after each accepted step (reference
    wr.py:737-746) and at initialization (wr.py:393-395, zero_invalid=True).

    Autodiff-clean like the RHS: NaN positions sample a sanitized cell and
    get their NaN re-applied as a final where (group_velocity handles NaN
    wavenumber/field args the same way internally).
    """
    posn = jnp.isnan(lon) | jnp.isnan(lat)
    lon_q = jnp.where(posn, 0.0, lon)
    lat_q = jnp.where(posn, 0.0, lat)
    f = sample_bg(bg, lon_q, lat_q, t)
    ug, vg = group_velocity(
        f[interp.M_U], f[interp.M_V], f[interp.M_QX], f[interp.M_QY],
        kx, ky, zero_invalid=zero_invalid,
    )
    nan = jnp.asarray(jnp.nan, ug.dtype)
    mask = posn if not zero_invalid else (posn & (kx != 0.0))
    return jnp.where(mask, nan, ug), jnp.where(mask, nan, vg)


def haversine(lon_a, lat_a, lon_b, lat_b) -> jnp.ndarray:
    """Angular distance between two points (reference cal_dis, wr.py:97-112)."""
    dlon = lon_a - lon_b
    dlat = lat_a - lat_b
    a = (
        jnp.sin(dlat / 2.0) ** 2
        + jnp.cos(lat_b) * jnp.cos(lat_a) * jnp.sin(dlon / 2.0) ** 2
    )
    return jnp.abs(2.0 * jnp.arctan2(jnp.sqrt(a), jnp.sqrt(1.0 - a)))


def kill_mask(y_new: jnp.ndarray, lon_prev, lat_prev, cut_off) -> jnp.ndarray:
    """Post-step termination: NaN-kill mask (reference wr.py:721-734).

    True where the new latitude left the traceable band (|lat| >= pi/2) or the
    step jumped more than ``cut_off`` radians (haversine displacement).
    """
    lat_kill = jnp.abs(y_new[S_LAT]) >= 0.5 * pi
    ddis = haversine(y_new[S_LON], y_new[S_LAT], lon_prev, lat_prev)
    return lat_kill | (ddis >= cut_off)
