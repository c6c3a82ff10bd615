"""Golden test: the vectorized general (non-uniform-grid) bilinear sampler
against the reference's scalar linint2_point (reference
interpolation.py:251-351), including the cyclic extension, out-of-range
returns, and the equality-based missing-value semantics."""

import importlib
import sys

import numpy as np
import pytest

from rwrt_tpu.ops.interp import linint2_point


@pytest.fixture(scope="module")
def ref_interp():
    from refshim import load_reference

    load_reference()  # ensures the reference dir is importable + stubs
    sys.path.insert(0, "/root/reference")
    return importlib.import_module("interpolation")


@pytest.mark.parametrize("xcyclic", [True, False])
@pytest.mark.parametrize("nopt", [1, -1])
def test_matches_reference_on_nonuniform_grids(ref_interp, xcyclic, nopt):
    rng = np.random.default_rng(7)
    nx, ny = 13, 9
    # Non-uniform strictly ascending axes (Gaussian-like).
    xi = np.cumsum(rng.uniform(0.5, 1.5, nx))
    yi = np.cumsum(rng.uniform(0.5, 1.5, ny))
    fi = rng.normal(size=(nx, ny))
    missing = -999.0
    # Sprinkle missing values (finite sentinel: the reference's == check
    # never fires for NaN).
    fi[rng.random((nx, ny)) < 0.15] = missing

    # Query points: inside, outside in y, outside in x, on nodes.
    xo = np.concatenate([
        rng.uniform(xi[0] - 3.0, xi[-1] + 3.0, 60),
        xi[[0, 4, -1]],
    ])
    yo = np.concatenate([
        rng.uniform(yi[0] - 2.0, yi[-1] + 2.0, 60),
        yi[[1, 5, -1]],
    ])

    want = np.array([
        ref_interp.linint2_point(nx, xi, ny, yi, fi, xcyclic,
                                 x, y, fo_missing=missing, nopt=nopt)
        for x, y in zip(xo, yo)
    ], dtype=float)
    got = np.asarray(linint2_point(xi, yi, fi, xo, yo, xcyclic=xcyclic,
                                   fo_missing=missing, nopt=nopt))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12,
                               err_msg=f"xcyclic={xcyclic} nopt={nopt}")


def test_nan_sentinel_propagates_like_reference(ref_interp):
    """With fo_missing=NaN the reference's == check never fires; NaN corners
    just propagate. Verify identical behavior."""
    xi = np.array([0.0, 1.0, 2.5, 4.0])
    yi = np.array([0.0, 2.0, 3.0])
    fi = np.arange(12, dtype=float).reshape(4, 3)
    fi[1, 1] = np.nan
    pts = [(0.5, 0.5), (1.2, 2.1), (3.0, 2.9)]
    for x, y in pts:
        want = ref_interp.linint2_point(4, xi, 3, yi, fi, False, x, y)
        got = float(np.asarray(linint2_point(
            xi, yi, fi, np.array([x]), np.array([y]), xcyclic=False))[0])
        if np.isnan(want):
            assert np.isnan(got)
        else:
            np.testing.assert_allclose(got, want, atol=1e-12)
