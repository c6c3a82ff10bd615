"""Group velocity (ug, vg) from the dispersion relation.

TPU-native cal_ugvg (reference wn.py:140-351). The reference carries three
dialects ('original' scalar, 'numpy' with NaN-zeroing, 'extent' numba kernel);
they are the same formula

    ug = fu + [(1 - kap^2) fqy - 2 kap fqx] / (K^2 (1 + kap^2))
    vg = fv + [2 kap fqy + (1 - kap^2) fqx] / (K^2 (1 + kap^2))

with kap = m/k and K^2 = k^2 (1 + kap^2) = k^2 + m^2 (reference wn.py:266-294).
Here there is one jnp implementation; NaN handling is selected by the
``zero_invalid`` flag:

- zero_invalid=False (the hot-loop 'extent' semantics, wn.py:318-342): NaNs
  propagate -- dead rays produce NaN group velocity.
- zero_invalid=True (the initialization 'numpy' semantics, wn.py:209-259):
  zwn == 0 returns zeros. Note the reference's attempted NaN-zeroing there is
  an IEEE no-op (wn.py:256-257 computes NaN * 0 = NaN), so NaN inputs yield
  NaN in BOTH dialects; only the zwn == 0 shortcut differs.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def group_velocity_core(fu, fv, fqx, fqy, zwn, mwn):
    """Sanitized compute + NaN masks (autodiff-clean building block).

    Evaluates the formula on NaN-free substitutes and returns the masks of
    where the IEEE result would have been NaN, instead of the NaNs
    themselves. Callers apply `where(mask, nan, value)` as the LAST step:
    that way no NaN ever appears inside a differentiated product, so
    zero-cotangent dead lanes cannot poison the shared background-field
    gradient (0 * NaN = NaN in the gather's scatter-add). The mask is the
    exact IEEE propagation set: ug is NaN iff any of (fu, fqx, fqy, zwn,
    mwn) is NaN (any finite kap keeps NaN terms NaN: 0 * NaN = NaN), and
    symmetrically for vg with fv.

    Returns (ug, vg, ug_nan, vg_nan); ug/vg entries under the mask are
    finite garbage and must be overwritten by the caller.
    """
    n_u, n_v = jnp.isnan(fu), jnp.isnan(fv)
    n_x, n_y = jnp.isnan(fqx), jnp.isnan(fqy)
    n_k, n_m = jnp.isnan(zwn), jnp.isnan(mwn)
    fu_s = jnp.where(n_u, 0.0, fu)
    fv_s = jnp.where(n_v, 0.0, fv)
    fqx_s = jnp.where(n_x, 0.0, fqx)
    fqy_s = jnp.where(n_y, 0.0, fqy)
    zwn_s = jnp.where(n_k, 1.0, zwn)
    mwn_s = jnp.where(n_m, 0.0, mwn)

    kap = mwn_s / zwn_s
    kap2 = kap * kap
    kap1 = 1.0 + kap2
    denom = zwn_s * zwn_s * kap1 * kap1  # K^2 (1+kap^2) = (k^2+m^2)(1+kap^2)
    ug = fu_s + ((1.0 - kap2) * fqy_s - 2.0 * kap * fqx_s) / denom
    vg = fv_s + (2.0 * kap * fqy_s + (1.0 - kap2) * fqx_s) / denom
    shared = n_x | n_y | n_k | n_m
    return ug, vg, n_u | shared, n_v | shared


def group_velocity(
    fu, fv, fqx, fqy, zwn, mwn, *, zero_invalid: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (ug, vg); all args broadcastable, any shape.

    NaN semantics are IEEE propagation (computed via group_velocity_core's
    masks, so the function is autodiff-clean: gradients through live lanes
    are unaffected by NaN lanes in the same batch).
    """
    ug, vg, ug_nan, vg_nan = group_velocity_core(fu, fv, fqx, fqy, zwn, mwn)
    nan = jnp.asarray(jnp.nan, ug.dtype)
    ug = jnp.where(ug_nan, nan, ug)
    vg = jnp.where(vg_nan, nan, vg)
    if zero_invalid:
        zero = jnp.zeros_like(ug)
        ug = jnp.where(zwn == 0.0, zero, ug)
        vg = jnp.where(zwn == 0.0, zero, vg)
    return ug, vg
