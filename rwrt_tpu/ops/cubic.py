"""Analytic dispersion-relation root solve: meridional wavenumbers m.

TPU-native replacement for the reference's polynomial-root machinery
(reference bs.py:19-66 Fortran cmplx_roots_sg / numba np.roots backends and
bs.py:892-1055 cal_ky*). Instead of host-side companion-matrix eigenvalue
solves per point, the cubic is solved in closed form (Cardano + trigonometric
method) fully vectorized over all rays -- no host callback, no per-point loop
(the reference's numpy path still loops per point, bs.py:1014-1039).

The dispersion relation for barotropic Rossby waves on the Mercator plane,
with zwn = k*R, m the meridional wavenumber (times R), ps = freq/zwn*R:

    fv*m^3 + zwn*(fu - ps)*m^2 + (zwn^2*fv + fqx)*m
        + zwn^3*(fu - ps - fqy/zwn^2) = 0

(coefficients per reference bs.py:1005-1011). Semantics preserved:

- degree reduction when leading coefficients are exactly zero (the numpy
  dialect's `abs(coeff[deg]) == 0` test, bs.py:1017-1021);
- a complex-conjugate pair counts as two real roots when |Im| < delt = 1e-8
  (bs.py:1030, matching the |r.imag| < delt filter on numeric roots);
- roots with |m| >= 100 are discarded (bs.py:931-932, 978-981);
- zwn == 0 yields no roots (bs.py:1003);
- root slots are ordered canonically: non-negative roots first, each group by
  ascending |m| (the documented sort of the reference's 'original' dialect,
  bs.py:935). The reference's 'numpy' dialect instead applies a
  Fortran-heritage slot shuffle (change_roots_order, bs.py:942-982) on top of
  whatever order the backend eigenvalue solver emitted -- an ordering that is
  solver-dependent and therefore not reproducible; we adopt the deterministic
  sort. Trajectory SETS are identical either way (slots integrate
  independently).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rwrt_tpu.constants import delt, mwn_cap, rearth


def _cbrt(x):
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def _solve_cubic_depressed(p, q):
    """Real roots of t^3 + p t + q = 0.

    Returns (roots (3, R), n_extra_real_mask): root 0 is always a real root;
    roots 1, 2 form the remaining pair, returned as their real part with a
    validity mask true when the pair is real to within delt (|Im| < delt,
    mirroring the reference's realness filter on numeric roots).
    """
    half_q = 0.5 * q
    third_p = p / 3.0
    disc = half_q * half_q + third_p * third_p * third_p

    # --- Cardano branch (disc >= 0): one real root + conjugate pair. ---
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = _cbrt(-half_q + sq)
    v = _cbrt(-half_q - sq)
    t0_card = u + v
    pair_re_card = -0.5 * (u + v)
    pair_im_card = (jnp.sqrt(3.0) / 2.0) * (u - v)

    # --- Trigonometric branch (disc < 0): three real roots. ---
    # Guard p >= 0 inputs (can't reach here with disc<0, but keep sqrt safe).
    mp = jnp.sqrt(jnp.maximum(-third_p, 1e-300 if p.dtype == jnp.float64 else 1e-30))
    cos_arg = jnp.clip(-half_q / (mp * mp * mp), -1.0, 1.0)
    theta = jnp.arccos(cos_arg) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    t0_trig = 2.0 * mp * jnp.cos(theta)
    t1_trig = 2.0 * mp * jnp.cos(theta - two_pi_3)
    t2_trig = 2.0 * mp * jnp.cos(theta + two_pi_3)

    use_card = disc > 0.0
    r0 = jnp.where(use_card, t0_card, t0_trig)
    r1 = jnp.where(use_card, pair_re_card, t1_trig)
    r2 = jnp.where(use_card, pair_re_card, t2_trig)
    pair_real = jnp.where(use_card, jnp.abs(pair_im_card) < delt, True)
    return jnp.stack([r0, r1, r2]), pair_real


@jax.custom_jvp
def _roots_from_coeffs(c3, c2, c1, c0, nonzero_k) -> jnp.ndarray:
    """Sorted NaN-padded real roots (R, 3) of c3 m^3 + c2 m^2 + c1 m + c0.

    Carries a custom JVP: the closed-form internals are a thicket of
    branch selects whose untaken branches evaluate to NaN (0 * NaN = NaN
    poisons reverse-mode cotangents), so tangents come from the implicit
    function theorem instead -- P(m; c) = 0 gives dm = -(sum_k dc_k m^k) /
    P'(m), exact wherever the root is simple. This is what makes the whole
    seed -> integrate pipeline end-to-end differentiable (adjoint
    sensitivities of trajectories w.r.t. the background wind; no reference
    counterpart -- a capability of the JAX re-design).
    """
    dtype = c3.dtype

    # Effective degree over the |m| < 100 root window. The reference reduces
    # degree only on EXACT zeros (bs.py:1017-1021) and delegates tiny leading
    # coefficients to its eigenvalue solver, which handles them gracefully
    # (one giant root, later discarded by the |m| >= 100 filter). Closed-form
    # Cardano, by contrast, is catastrophically unstable when |c3| is tiny
    # (the depressed-cubic shift b/3 = c2/(3*c3) explodes) -- e.g. a
    # near-zonal background with fv ~ 1e-16 yields garbage. Compare each
    # coefficient's largest possible contribution over the window
    # s_d = |c_d| * 100^d: if all roots lie in the window then Vieta gives
    # s3 >= smax/3, so demoting when s3 < tau * smax can never drop an
    # in-window root; the demoted giant root is provably outside the window
    # exactly where the reference's filter would discard it.
    eps = jnp.finfo(dtype).eps
    tau = 1e4 * eps  # ~1e-12 in f64, ~1e-3 in f32
    s3 = jnp.abs(c3) * mwn_cap**3
    s2 = jnp.abs(c2) * mwn_cap**2
    s1 = jnp.abs(c1) * mwn_cap
    s0 = jnp.abs(c0)
    smax = jnp.maximum(jnp.maximum(s3, s2), jnp.maximum(s1, s0))
    thresh = tau * smax
    deg3 = s3 >= thresh
    deg2 = ~deg3 & (s2 >= thresh)
    deg1 = ~deg3 & ~deg2 & (s1 >= thresh)
    # NaN coefficients: comparisons are False -> no roots, count 0. All-zero
    # coefficients: smax == 0 -> thresh 0 -> s >= 0 True... guard:
    nontrivial = smax > 0.0
    deg3 &= nontrivial
    deg2 &= nontrivial
    deg1 &= nontrivial

    nan = jnp.asarray(jnp.nan, dtype)

    # --- cubic: normalize to monic and depress. ---
    a = jnp.where(deg3, c3, 1.0)
    b = c2 / a
    c = c1 / a
    d = c0 / a
    p = c - b * b / 3.0
    q = 2.0 * b**3 / 27.0 - b * c / 3.0 + d
    t_roots, pair_real = _solve_cubic_depressed(p, q)
    shift = b / 3.0

    def polish(m):
        # Two guarded Newton iterations on the monic cubic recover the
        # precision lost in the depressed-cubic shift when |b| is large.
        # Steps are applied only when small (near-double roots have dp ~ 0
        # and must not be thrown out of the window by a wild step).
        for _ in range(2):
            pm = ((m + b) * m + c) * m + d
            dpm = (3.0 * m + 2.0 * b) * m + c
            step = pm / jnp.where(dpm == 0.0, 1.0, dpm)
            m = m - jnp.where(jnp.abs(step) < 0.5, step, 0.0)
        return m

    cub0 = polish(t_roots[0] - shift)
    # The conjugate-pair slots are polished only when they are genuine real
    # roots (trig branch); a treated-as-real tiny-Im pair must keep its
    # common real part.
    genuine_pair = pair_real & jnp.logical_not(
        (0.5 * q) ** 2 + (p / 3.0) ** 3 > 0.0
    )
    cub1 = jnp.where(
        pair_real,
        jnp.where(genuine_pair, polish(t_roots[1] - shift), t_roots[1] - shift),
        nan,
    )
    cub2 = jnp.where(
        pair_real,
        jnp.where(genuine_pair, polish(t_roots[2] - shift), t_roots[2] - shift),
        nan,
    )

    # --- quadratic: c2 m^2 + c1 m + c0; pair real when |Im| < delt. ---
    a2 = jnp.where(deg2, c2, 1.0)
    disc2 = c1 * c1 - 4.0 * a2 * c0
    sq2 = jnp.sqrt(jnp.abs(disc2))
    q_im = sq2 / (2.0 * jnp.abs(a2))
    q_real = (disc2 >= 0.0) | (q_im < delt)
    # Stable quadratic roots: avoid cancellation via the sign trick. When the
    # pair is complex but |Im| < delt, both slots take the real part (the
    # reference keeps r.real of both conjugates, bs.py:1030).
    qq = -0.5 * (c1 + jnp.sign(c1 + (c1 == 0.0)) * sq2)
    qq_safe = jnp.where(qq != 0.0, qq, 1.0)
    pair_re = -c1 / (2.0 * a2)
    quad0 = jnp.where(
        q_real,
        jnp.where(disc2 >= 0.0, jnp.where(qq != 0.0, qq / a2, 0.0), pair_re),
        nan,
    )
    quad1 = jnp.where(
        q_real,
        jnp.where(disc2 >= 0.0, jnp.where(qq != 0.0, c0 / qq_safe, 0.0), pair_re),
        nan,
    )

    # --- linear: c1 m + c0. ---
    lin0 = -c0 / jnp.where(deg1, c1, 1.0)

    r0 = jnp.where(deg3, cub0, jnp.where(deg2, quad0, jnp.where(deg1, lin0, nan)))
    r1 = jnp.where(deg3, cub1, jnp.where(deg2, quad1, nan))
    r2 = jnp.where(deg3, cub2, nan)
    roots = jnp.stack([r0, r1, r2], axis=-1)  # (R, 3)

    # Validity: finite, |m| < 100, zwn != 0 (reference bs.py:979, 1003).
    valid = jnp.isfinite(roots) & (jnp.abs(roots) < mwn_cap) & nonzero_k[..., None]
    roots = jnp.where(valid, roots, nan)

    # Canonical slot order: (negative?, |m|) ascending, NaN last
    # (reference bs.py:935). |m| < 100 for valid roots so an offset of 200
    # cleanly separates the groups; NaN keys sort last under jnp.sort via inf.
    key = jnp.where(
        jnp.isnan(roots), jnp.inf, jnp.abs(roots) + jnp.where(roots < 0, 200.0, 0.0)
    )
    order = jnp.argsort(key, axis=-1)
    return jnp.take_along_axis(roots, order, axis=-1)


@_roots_from_coeffs.defjvp
def _roots_from_coeffs_jvp(primals, tangents):
    c3, c2, c1, c0, nonzero_k = primals
    dc3, dc2, dc1, dc0, _ = tangents
    m = _roots_from_coeffs(c3, c2, c1, c0, nonzero_k)
    c3e, c2e, c1e, c0e = (c[..., None] for c in (c3, c2, c1, c0))
    d3e, d2e, d1e, d0e = (jnp.broadcast_to(jnp.asarray(d, m.dtype), c3.shape)[..., None]
                          for d in (dc3, dc2, dc1, dc0))
    # Implicit function theorem on P(m; c) = 0. NaN (absent) root slots get
    # zero tangent so they cannot poison downstream reductions -- and the
    # coefficient arrays entering the linear tangent map must themselves be
    # NaN-free, because reverse mode TRANSPOSES this map: a zero cotangent
    # times a NaN m^k is NaN. Double roots (P'(m) = 0) get den -> 1 rather
    # than an honest infinite sensitivity, for the same reason (0 * inf).
    absent = jnp.isnan(m)
    m_s = jnp.where(absent, 0.0, m)
    num = ((d3e * m_s + d2e) * m_s + d1e) * m_s + d0e
    den = (3.0 * c3e * m_s + 2.0 * c2e) * m_s + c1e
    den = jnp.where(jnp.isnan(den) | (den == 0.0), 1.0, den)
    dm = jnp.where(absent, 0.0, -num / den)
    return m, dm


def solve_dispersion_cubic(fu, fv, fqx, fqy, freq, zwn) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Meridional-wavenumber roots at each point (vectorized cal_ky).

    Args:
      fu, fv, fqx, fqy: (R,) Mercator background samples.
      freq: wave frequency (scalar or (R,)).
      zwn: (R,) or scalar dimensionless zonal wavenumber k*R.

    Returns:
      roots: (R, 3) real roots, NaN-padded, canonical order (non-negative
        ascending-|m| first, then negative ascending-|m|).
      count: (R,) number of valid roots.

    Differentiable end to end: root tangents come from the implicit
    function theorem (see _roots_from_coeffs).
    """
    fu, fv, fqx, fqy, zwn = jnp.broadcast_arrays(
        *(jnp.asarray(a) for a in (fu, fv, fqx, fqy, zwn))
    )
    nonzero_k = zwn != 0.0
    kz = jnp.where(nonzero_k, zwn, 1.0)
    ps = freq / kz * rearth

    # Coefficients highest-degree first: c3 m^3 + c2 m^2 + c1 m + c0.
    c3 = fv
    c2 = kz * (fu - ps)
    c1 = kz * kz * fv + fqx
    c0 = kz**3 * (fu - ps) - fqy * kz

    roots = _roots_from_coeffs(c3, c2, c1, c0, nonzero_k)
    count = jnp.sum(jnp.logical_not(jnp.isnan(roots)), axis=-1)
    return roots, count


def fortran_slot_order(mwn: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """Vectorized Fortran-heritage slot shuffle (reference change_roots_order,
    bs.py:942-982) applied to a (..., 3) root array with per-point root count.

    The reference applies this to whatever order its eigenvalue backend
    emitted, so absolute slot parity with the reference is backend-dependent;
    this function reproduces the TRANSFORM itself (the conditional swap
    sequences for 3/2/1 roots followed by the final slot reversal) for users
    who want reference-style slots on top of our canonical order.
    """
    m0, m1, m2 = mwn[..., 0], mwn[..., 1], mwn[..., 2]

    def swap(a, b, cond):
        return jnp.where(cond, b, a), jnp.where(cond, a, b)

    # --- deg == 3 (bs.py:948-960) ---
    is3 = count == 3
    c = is3 & (m2 >= 0.0) & (m2 < m1)
    m1, m2 = swap(m1, m2, c)
    c = is3 & (m0 < 0.0)
    m0, m1 = swap(m0, m1, c)
    c = is3 & (((m1 < 0.0) & (m2 < 0.0) & (m1 < m2)) | ((m1 > 0.0) & (m2 < 0.0)))
    m1, m2 = swap(m1, m2, c)

    # --- deg == 2 (bs.py:962-969): only iteration i=0 executes (both
    # branches break); swap slots 0,1 unless m0 is a finite positive root.
    is2 = count == 2
    c = is2 & jnp.logical_not(jnp.isfinite(m0) & (m0 > 0.0))
    m0, m1 = swap(m0, m1, c)

    # --- deg == 1 (bs.py:971-976): the literal i = 0,1,2 sweep. ---
    is1 = count == 1
    for i in range(3):
        mi = (m0, m1, m2)[i]
        c_pos = is1 & jnp.isfinite(mi) & (mi >= 0.0) & (i != 0)
        c_neg = is1 & jnp.isfinite(mi) & (mi <= 0.0) & (i != 2) & ~c_pos
        if i == 0:
            m0, m1 = swap(m0, m1, c_neg)
        elif i == 1:
            m1, m0 = swap(m1, m0, c_pos)
            # c_neg with i=1 swaps slot 1 with itself: no-op.
        else:
            m2, m0 = swap(m2, m0, c_pos)

    # Final reversal (bs.py:982). The |m| >= 100 -> NaN filter was already
    # applied upstream by solve_dispersion_cubic.
    return jnp.stack([m2, m1, m0], axis=-1)
