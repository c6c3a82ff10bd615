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


def group_velocity(
    fu, fv, fqx, fqy, zwn, mwn, *, zero_invalid: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (ug, vg); all args broadcastable, any shape."""
    kap = mwn / zwn
    kap2 = kap * kap
    kap1 = 1.0 + kap2
    denom = zwn * zwn * kap1 * kap1  # K^2 (1+kap^2) = (k^2+m^2)(1+kap^2)
    ug = fu + ((1.0 - kap2) * fqy - 2.0 * kap * fqx) / denom
    vg = fv + (2.0 * kap * fqy + (1.0 - kap2) * fqx) / denom
    if zero_invalid:
        zero = jnp.zeros_like(ug)
        ug = jnp.where(zwn == 0.0, zero, ug)
        vg = jnp.where(zwn == 0.0, zero, vg)
    return ug, vg
