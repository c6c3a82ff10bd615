"""Native C++ polynomial-root backend tests (rwrt_tpu/native/)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from rwrt_tpu.native import build as native_build
from rwrt_tpu.ops import cubic_host


def _match_err(a, b):
    d = np.abs(a[:, None] - b[None, :])
    ri, ci = linear_sum_assignment(d)
    return d[ri, ci].max()


def test_native_builds():
    assert native_build.available(), "g++ toolchain should be present"


@pytest.mark.parametrize("degree", [1, 2, 3, 5, 8])
def test_native_matches_numpy(degree):
    rng = np.random.default_rng(degree)
    c = rng.normal(size=(20, degree + 1)) + 1j * 0.1 * rng.normal(
        size=(20, degree + 1)
    )
    r_nat = cubic_host.solve_roots(c, "native")
    r_np = cubic_host.solve_roots(c, "numpy")
    for a, b in zip(r_nat, r_np):
        assert _match_err(a, b) < 1e-9


def test_native_matches_analytic_cubic():
    """Cross-check the device-side closed-form cubic against the native
    iterative solver on dispersion-like coefficients."""
    import jax.numpy as jnp

    from rwrt_tpu.ops.cubic import solve_dispersion_cubic
    from rwrt_tpu.constants import rearth

    rng = np.random.default_rng(7)
    n = 200
    fu = rng.uniform(5, 60, n)
    fv = rng.uniform(-10, 10, n)
    fqx = rng.uniform(-500, 500, n)
    fqy = rng.uniform(100, 3000, n)
    zwn = 4.0

    roots, count = solve_dispersion_cubic(
        jnp.asarray(fu), jnp.asarray(fv), jnp.asarray(fqx), jnp.asarray(fqy),
        0.0, zwn,
    )
    roots = np.asarray(roots)

    coeffs = np.stack([
        fv, zwn * fu, zwn * zwn * fv + fqx, zwn**3 * fu - fqy * zwn
    ], axis=-1).astype(complex)
    r_nat = cubic_host.solve_roots(coeffs, "native")

    for i in range(n):
        got = roots[i][np.isfinite(roots[i])]
        real_nat = np.sort(
            [r.real for r in r_nat[i]
             if abs(r.imag) < 1e-8 and abs(r.real) < 100.0]
        )
        np.testing.assert_allclose(
            np.sort(got), real_nat, rtol=1e-6, atol=1e-7,
            err_msg=f"row {i}",
        )


def test_degenerate_leading_coefficient():
    """Exact-zero leading coefficient is rejected by the native solver (the
    caller reduces degree first, as the dispersion path does)."""
    c = np.array([[0.0, 1.0, -3.0, 2.0]], dtype=complex)
    r = cubic_host.solve_roots(c, "native")
    # batch fallback fills NaN on failure rows
    assert np.isnan(r).all() or len(r[0]) == 3
