"""Golden tests: interpolation/Mercator sampling, cubic roots, group velocity."""

import numpy as np
import jax.numpy as jnp
import pytest

import rwrt_tpu as rt
from rwrt_tpu.ops import interp
from rwrt_tpu.ops.cubic import solve_dispersion_cubic
from rwrt_tpu.ops.groupvel import group_velocity

from refshim import load_reference, make_reference_bs


@pytest.fixture(scope="module")
def pair(jet_field):
    u, v, lat, lon = jet_field
    ref = make_reference_bs(u, v, lat, lon, xcyclic=True)
    ours = rt.prepare(u, v, lat, lon, xcyclic=True,
                      read_dtype="float32", cal_dtype="float64")
    return ref, ours


def _sample_points(seed=0, n=500):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-2 * np.pi, 4 * np.pi, n)  # exercise wrapping
    lat = rng.uniform(-np.pi / 2 + 1e-3, np.pi / 2 - 1e-3, n)
    # include near-polar points hitting the cos cap, and out-of-range lats
    lat[:5] = [np.pi / 2 - 0.001, -np.pi / 2 + 0.001, 1.6, -1.6, 0.0]
    return lon, lat


def test_mercator_sampling_matches_reference(pair):
    ref, ours = pair
    lon, lat = _sample_points()
    want = ref.cal_bs_mercator_point(lon.copy(), lat.copy(), mode="numpy")
    got = np.asarray(
        interp.sample_mercator(
            ours.fields, ours.lon[0], ours.lat[0],
            jnp.asarray(ours.dx), jnp.asarray(ours.dy), lon, lat,
        )
    )
    assert got.shape == want.shape
    scale = np.nanmax(np.abs(want), axis=1, keepdims=True) + 1e-30
    np.testing.assert_allclose(
        got / scale, want / scale, rtol=0, atol=1e-8, equal_nan=True
    )


def test_cubic_roots_match_reference_sets(pair):
    """Root SETS per point must match cal_ky (slot order is solver-dependent
    in the reference, see ops/cubic.py docstring)."""
    ref, ours = pair
    bs_mod, _, _ = load_reference()
    lon, lat = _sample_points(seed=1, n=200)
    keep = np.abs(lat) < np.radians(85.0)
    lon, lat = lon[keep], lat[keep]
    f = ref.cal_bs_mercator_point(lon.copy(), lat.copy(), mode="numpy")
    fmu, fmv, fmqx, fmqy = f[0], f[1], f[6], f[7]

    for zwn in (0.0, 1.0, 3.0, 6.0):
        want_roots, want_n = bs_mod.cal_ky(
            fmu, fmv, fmqx, fmqy, 0.0, zwn, mode="numpy", root_method="numpy"
        )
        got_roots, got_n = solve_dispersion_cubic(
            jnp.asarray(fmu), jnp.asarray(fmv), jnp.asarray(fmqx),
            jnp.asarray(fmqy), 0.0, zwn,
        )
        got_roots = np.asarray(got_roots)
        np.testing.assert_array_equal(np.asarray(got_n), want_n.astype(int))
        # compare as sorted sets; NaN sorts last on both sides
        a = np.sort(got_roots, axis=1)
        b = np.sort(want_roots, axis=1)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8, equal_nan=True)


def test_initial_slot_order_matches_original_dialect(pair):
    """Slot order follows the reference 'original' sort: non-negative roots
    first, each group ascending by |m| (reference bs.py:935)."""
    ref, _ = pair
    lon, lat = _sample_points(seed=2, n=100)
    keep = np.abs(lat) < np.radians(80.0)
    lon, lat = lon[keep], lat[keep]
    f = ref.cal_bs_mercator_point(lon.copy(), lat.copy(), mode="numpy")
    roots, _ = solve_dispersion_cubic(
        jnp.asarray(f[0]), jnp.asarray(f[1]), jnp.asarray(f[6]),
        jnp.asarray(f[7]), 0.0, 3.0,
    )
    roots = np.asarray(roots)
    for row in roots:
        vals = row[np.isfinite(row)]
        key = [(v < 0, abs(v)) for v in vals]
        assert key == sorted(key), row


def test_group_velocity_matches_reference(pair):
    ref, _ = pair
    _, wn_mod, _ = load_reference()
    lon, lat = _sample_points(seed=3, n=300)
    f = ref.cal_bs_mercator_point(lon.copy(), lat.copy(), mode="numpy")
    fmu, fmv, fmqx, fmqy = f[0], f[1], f[6], f[7]
    rng = np.random.default_rng(4)
    mwn = rng.uniform(-8, 8, (3, len(lon)))
    mwn[0, :10] = np.nan

    for zwn in (2.0, 5.0):
        # init dialect: NaN -> 0
        want_u, want_v = wn_mod.cal_ugvg(fmu, fmv, fmqx, fmqy, zwn, mwn.copy(),
                                         mode="numpy")
        got_u, got_v = group_velocity(
            jnp.asarray(fmu)[None], jnp.asarray(fmv)[None],
            jnp.asarray(fmqx)[None], jnp.asarray(fmqy)[None],
            zwn, jnp.asarray(mwn), zero_invalid=True,
        )
        np.testing.assert_allclose(np.asarray(got_u), want_u, rtol=1e-9,
                                   atol=1e-9, equal_nan=True)
        np.testing.assert_allclose(np.asarray(got_v), want_v, rtol=1e-9,
                                   atol=1e-9, equal_nan=True)

    # hot-loop 'extent' dialect: NaN propagates
    zwn_arr = np.full((3, len(lon)), 4.0)
    want_u, want_v = wn_mod.cal_ugvg(
        fmu[None].repeat(3, 0).reshape(3, -1, 1),
        fmv[None].repeat(3, 0).reshape(3, -1, 1),
        fmqx[None].repeat(3, 0).reshape(3, -1, 1),
        fmqy[None].repeat(3, 0).reshape(3, -1, 1),
        zwn_arr.reshape(3, -1, 1), mwn.reshape(3, -1, 1), mode="extent",
    )
    got_u, got_v = group_velocity(
        jnp.asarray(fmu)[None], jnp.asarray(fmv)[None],
        jnp.asarray(fmqx)[None], jnp.asarray(fmqy)[None],
        jnp.asarray(zwn_arr), jnp.asarray(mwn),
    )
    np.testing.assert_allclose(np.asarray(got_u), want_u[..., 0], rtol=1e-9,
                               atol=1e-9, equal_nan=True)
    np.testing.assert_allclose(np.asarray(got_v), want_v[..., 0], rtol=1e-9,
                               atol=1e-9, equal_nan=True)


def test_fortran_slot_order_matches_reference():
    """fortran_slot_order must reproduce change_roots_order (bs.py:942-982)
    for arbitrary root layouts and counts."""
    import jax.numpy as jnp
    from rwrt_tpu.ops.cubic import fortran_slot_order

    bs_mod, _, _ = load_reference()
    rng = np.random.default_rng(11)
    cases = []
    for _ in range(300):
        deg = int(rng.integers(0, 4))
        vals = rng.uniform(-50, 50, 3)
        m = np.full(3, np.nan)
        m[:deg] = vals[:deg]
        cases.append((m, deg))

    ours_in = jnp.asarray(np.stack([c[0] for c in cases]))
    counts = jnp.asarray(np.array([c[1] for c in cases]))
    got = np.asarray(fortran_slot_order(ours_in, counts))

    for i, (m, deg) in enumerate(cases):
        want, _ = bs_mod.change_roots_order(m.copy(), deg)
        np.testing.assert_allclose(got[i], want, equal_nan=True,
                                   err_msg=f"case {i} deg {deg} m {m}")


def test_sampler_negative_lon0_grid():
    """Grids in the -180..180 convention sample identically to the same
    field stored 0..360 (the old (lon%2pi - lon0)/dx indexing sent points
    west of the origin past the last column)."""
    import rwrt_tpu as rt
    from rwrt_tpu.ops import interp

    nlon, nlat = 64, 33
    dx = 2 * np.pi / nlon
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon_neg = -np.pi + np.arange(nlon) * dx
    lon_pos = np.arange(nlon) * dx
    rng = np.random.default_rng(5)
    u = 20 * np.cos(lat)[None, :] ** 2 + np.cos(3 * lon_neg[:, None]) * np.cos(lat)[None, :]
    v = np.sin(2 * lon_neg[:, None]) * np.cos(lat)[None, :]
    bs_neg = rt.prepare(u, v, lat, lon_neg, cal_dtype="float64")
    k = nlon // 2
    bs_pos = rt.prepare(np.roll(u, k, axis=0), np.roll(v, k, axis=0),
                        lat, lon_pos, cal_dtype="float64")
    plon = jnp.asarray(rng.uniform(-np.pi, np.pi, 200))
    plat = jnp.asarray(rng.uniform(-1.4, 1.4, 200))
    a = np.asarray(interp.sample_mercator(
        bs_neg.fields, bs_neg.lon[0], bs_neg.lat[0], bs_neg.dx, bs_neg.dy,
        plon, plat))
    b = np.asarray(interp.sample_mercator(
        bs_pos.fields, bs_pos.lon[0], bs_pos.lat[0], bs_pos.dx, bs_pos.dy,
        plon, plat))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12, equal_nan=True)
