"""End-to-end differentiability (adjoint sensitivities).

The whole seed -> integrate pipeline is differentiable: the dispersion-root
solve carries an implicit-function-theorem custom JVP (ops/cubic.py
_roots_from_coeffs), and the fixed-step scan is plain jnp. No reference
counterpart -- the reference's host eigenvalue solvers and numba kernels are
opaque to autodiff; this is a capability of the JAX re-design (cf. the
differentiable ray tracers in PAPERS.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu import tracer
from rwrt_tpu.ops.cubic import solve_dispersion_cubic
from rwrt_tpu.solvers import rk4


@pytest.fixture(scope="module")
def base_field(jet_field):
    u, v, lat, lon = jet_field
    return np.asarray(u), np.asarray(v), lat, lon


def _final_lat(amp, base_field, nt=25):
    u, v, lat, lon = base_field
    bs = rt.prepare(amp * jnp.asarray(u), jnp.asarray(v), lat, lon,
                    read_dtype="float64", cal_dtype="float64")
    bg = tracer.make_background(bs, 0.0)
    y0, _, _ = tracer.initialize(
        bg, jnp.asarray([0.3]), jnp.asarray([0.25]), jnp.asarray([4.0]))
    ys, _, _ = rk4.trace(bg, y0, 7200.0, nt, jnp.asarray(0.2))
    return ys[-1, 1, 0]


def test_grad_through_full_pipeline_matches_fd(base_field):
    """reverse-mode d(final lat)/d(wind amplitude) == central differences.

    Covers prepare (FD stacks, smth9, vorticity), initialize (background
    sample + cubic roots + group velocity), and 24 RK4 steps with kill
    masks -- any 0 * NaN cotangent poisoning anywhere in that pipeline
    would surface as a NaN gradient here.
    """
    g = jax.grad(_final_lat)(1.0, base_field)
    eps = 1e-6
    fd = (_final_lat(1.0 + eps, base_field)
          - _final_lat(1.0 - eps, base_field)) / (2 * eps)
    g, fd = float(g), float(fd)
    assert np.isfinite(g)
    assert abs(g - fd) <= 1e-6 * max(1.0, abs(fd))


def test_root_jvp_matches_fd_per_coefficient():
    """Implicit-function-theorem tangents vs finite differences of the
    closed-form primal, on a batch covering cubic/quadratic demotion and
    rootless lanes."""
    rng = np.random.default_rng(7)
    n = 64
    fu = jnp.asarray(rng.normal(15.0, 12.0, n))
    fv = jnp.asarray(np.where(rng.random(n) < 0.25, 0.0,
                              rng.normal(0.0, 4.0, n)))  # some demoted lanes
    fqx = jnp.asarray(rng.normal(0.0, 1.0, n))
    fqy = jnp.asarray(rng.normal(2.0, 1.0, n))
    zwn = jnp.full(n, 4.0)

    def roots_of(s):
        r, _ = solve_dispersion_cubic(fu * s, fv, fqx, fqy, 0.0, zwn)
        return r

    r0, dr = jax.jvp(roots_of, (1.0,), (1.0,))
    eps = 1e-7
    fd = (np.asarray(roots_of(1.0 + eps))
          - np.asarray(roots_of(1.0 - eps))) / (2 * eps)
    r0, dr = np.asarray(r0), np.asarray(dr)
    # Compare where the root exists on both sides of the FD stencil (root
    # births/deaths under perturbation make the FD invalid there).
    ok = np.isfinite(fd) & np.isfinite(r0)
    assert ok.sum() > 30
    np.testing.assert_allclose(dr[ok], fd[ok], rtol=1e-5, atol=1e-8)
    # Absent roots carry exactly zero tangent (no downstream poisoning).
    assert np.all(dr[~np.isfinite(r0)] == 0.0)


def test_grad_wrt_source_position(base_field):
    """Sensitivity to the seed location (the other natural control)."""
    u, v, lat, lon = base_field
    bs = rt.prepare(u, v, lat, lon, read_dtype="float64",
                    cal_dtype="float64")
    bg = tracer.make_background(bs, 0.0)

    def final_lat(slat):
        y0, _, _ = tracer.initialize(
            bg, jnp.asarray([0.3]), jnp.asarray([slat]), jnp.asarray([4.0]))
        ys, _, _ = rk4.trace(bg, y0, 7200.0, 13, jnp.asarray(0.2))
        return ys[-1, 1, 0]

    g = float(jax.grad(final_lat)(0.25))
    eps = 1e-6
    fd = (float(final_lat(0.25 + eps)) - float(final_lat(0.25 - eps))) / (2 * eps)
    assert np.isfinite(g)
    assert abs(g - fd) <= 1e-5 * max(1.0, abs(fd))


def test_optimize_seeds_reaches_target():
    """Differentiable source targeting (diagnostics/targeting.py): Adam on
    the softmin great-circle miss distance steers seeds until their rays
    pass the target -- the prospective counterpart of the WRF postprocessor's
    wave-source accounting."""
    from rwrt_tpu.diagnostics import targeting

    nlon, nlat = 96, 49
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    u = 30.0 * np.cos(lat)[None, :] * np.ones((nlon, 1))
    v = np.zeros((nlon, nlat))
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")

    res = targeting.optimize_seeds(
        bs, np.radians([10.0, 20.0]), np.radians([5.0, 8.0]), (4.0,),
        np.radians(120.0), np.radians(35.0),
        nt=121, steps=60, learning_rate=0.03,
    )
    # Objective decreased and every seed's best ray passes within 1 degree.
    assert res.history[-1] < res.history[0]
    assert np.degrees(np.asarray(res.miss)).max() < 1.0
    # Positions stayed in bounds.
    assert np.all(np.abs(np.asarray(res.source_lat)) <= 1.4)
