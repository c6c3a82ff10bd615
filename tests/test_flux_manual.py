"""Hand-computed tests pinning the Li-Yang WRF pipeline to the manual's
section-4 specification: Fun1's truncation-velocity + abnormal-wavenumber
thresholds, Fun2's region selection, Fun3's flux maps and target-region
aggregates (average propagation time, average speed, wave sources), and the
-360..720 degree longitude scope."""

import numpy as np
import jax.numpy as jnp

from rwrt_tpu.constants import rearth
from rwrt_tpu.diagnostics import flux as flux_mod
from rwrt_tpu.tracer import RayTrajectories

HOUR = 3600.0


def _toy_traj():
    """One source, one zwn, 3 root slots, 4 output steps.

    Slot 0: eastward ray along the equator, 10 deg/step.
    Slot 1: ray seeded inside the target box, dies at step 2.
    Slot 2: rootless (all NaN).
    """
    nt = 4
    shape = (nt, 3, 1, 1)
    lon = np.full(shape, np.nan)
    lat = np.full(shape, np.nan)
    kx = np.full(shape, np.nan)
    ky = np.full(shape, np.nan)
    amp = np.full(shape, np.nan)
    ug = np.full(shape, np.nan)
    vg = np.full(shape, np.nan)

    lon[:, 0, 0, 0] = np.radians([0.0, 10.0, 20.0, 30.0])
    lat[:, 0, 0, 0] = 0.0
    kx[:, 0, 0, 0] = 3.0
    ky[:, 0, 0, 0] = [1.0, 2.0, 50.0, 200.0]
    amp[:, 0, 0, 0] = [1.0, 2.0, 4.0, 8.0]
    ug[:, 0, 0, 0] = [30.0, 30.0, 30.0, 120.0]
    vg[:, 0, 0, 0] = [0.0, 40.0, 0.0, 0.0]

    lon[:2, 1, 0, 0] = np.radians([20.0, 21.0])
    lat[:2, 1, 0, 0] = np.radians([5.0, 5.0])
    kx[:2, 1, 0, 0] = 3.0
    ky[:2, 1, 0, 0] = -1.0
    amp[:2, 1, 0, 0] = 1.0
    ug[:2, 1, 0, 0] = 10.0
    vg[:2, 1, 0, 0] = 0.0

    return RayTrajectories(*(jnp.asarray(a) for a in
                             (lon, lat, kx, ky, amp, ug, vg)))


def test_fun1_speed_and_wavenumber_thresholds():
    traj = _toy_traj()
    # No thresholds: all finite points valid (4 on slot 0, 2 on slot 1).
    base = np.asarray(flux_mod.threshold_filter(traj))
    assert int(base.sum()) == 6
    # Truncation speed threshold: slot 0 step 1 has |cg| = 50, step 3 has
    # |cg| = 120; speed_max=100 drops exactly step 3.
    v = np.asarray(flux_mod.threshold_filter(traj, speed_max=100.0))
    assert int(v.sum()) == 5
    assert not v[3, 0, 0, 0]
    # speed_min=20 drops slot 1 entirely (|cg| = 10).
    v = np.asarray(flux_mod.threshold_filter(traj, speed_min=20.0))
    assert int(v.sum()) == 4
    # Abnormal wavenumber: |m| >= 100 drops slot 0 step 3 only.
    v = np.asarray(flux_mod.threshold_filter(traj, mwn_max=100.0))
    assert int(v.sum()) == 5
    assert not v[3, 0, 0, 0]


def test_fun2_region_selection():
    traj = _toy_traj()
    m = np.asarray(flux_mod.region_mask(traj, (15.0, 25.0), (-2.0, 10.0)))
    assert m[0, 0, 0] and m[1, 0, 0] and not m[2, 0, 0]
    # A box the rays never reach.
    m = np.asarray(flux_mod.region_mask(traj, (200.0, 210.0), (-2.0, 10.0)))
    assert not m.any()
    # Date-line-crossing box containing lon=0.
    m = np.asarray(flux_mod.region_mask(traj, (350.0, 5.0), (-2.0, 2.0)))
    assert m[0, 0, 0] and not m[1, 0, 0]


def test_fun3_region_statistics_hand_computed():
    traj = _toy_traj()
    tstep = 2 * HOUR
    stats = flux_mod.region_statistics(
        traj, (15.0, 25.0), (-2.0, 10.0), tstep)
    # Both live rays pass through the box.
    assert stats.n_passing == 2
    # Slot 0 first enters at step 2 (lon 20), slot 1 at step 0 (seeded in).
    assert stats.first_entry_step[0, 0, 0] == 2
    assert stats.first_entry_step[1, 0, 0] == 0
    assert stats.first_entry_step[2, 0, 0] == -1
    np.testing.assert_allclose(stats.mean_entry_time,
                               (2 * tstep + 0.0) / 2.0)
    # Average speed uses only rays entering after t=0: slot 0 travels 20 deg
    # along the equator in 2 steps.
    want = np.radians(20.0) * rearth / (2 * tstep)
    np.testing.assert_allclose(stats.mean_speed, want, rtol=1e-12)
    # Wave sources of the passing rays are their seeds.
    np.testing.assert_allclose(np.sort(np.degrees(stats.source_lon)),
                               [0.0, 20.0])


def test_fun3_flux_weights_hand_computed():
    traj = _toy_traj()
    # 3-degree bins => slot-0 points (0, 10, 20, 30 E) land in distinct cells.
    kw = dict(nlon_bins=360, nlat_bins=60)
    cnt_expected = 6

    wrf = flux_mod.wave_ray_flux(traj, weight="count", **kw)
    assert int(np.asarray(wrf.count).sum()) == cnt_expected
    # Unit-vector flux: total |flux| <= count, equality when each cell has
    # one point.
    fu = np.asarray(wrf.flux_u)
    # slot 0 step 1: direction (30, 40)/50 -> (0.6, 0.8) in its cell.
    ix = int((10.0 + 360.0) / 3.0)
    iy = int((0.0 + 90.0) / 3.0)
    np.testing.assert_allclose(fu[ix, iy], 0.6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(wrf.flux_v)[ix, iy], 0.8, rtol=1e-6)

    wrf = flux_mod.wave_ray_flux(traj, weight="cg", **kw)
    np.testing.assert_allclose(np.asarray(wrf.flux_u)[ix, iy], 30.0)
    wrf = flux_mod.wave_ray_flux(traj, weight="amp_cg", **kw)
    np.testing.assert_allclose(np.asarray(wrf.flux_u)[ix, iy], 2.0 * 30.0)
    # Fun1 thresholds thread through the map pipeline.
    wrf = flux_mod.wave_ray_flux(traj, weight="count", mwn_max=100.0,
                                 speed_max=100.0, **kw)
    assert int(np.asarray(wrf.count).sum()) == 5


def test_rootless_lanes_do_not_pass_regions():
    """Never-born rootless lanes keep a finite frozen seed position; they
    must not count as rays passing through a target box (review finding)."""
    shape = (3, 2, 1, 1)
    lon = np.full(shape, np.radians(20.0))
    lat = np.zeros(shape)
    amp = np.full(shape, np.nan)
    amp[:, 0] = 1.0  # slot 0 born; slot 1 rootless, frozen inside the box
    ones = np.ones(shape)
    traj = RayTrajectories(*(jnp.asarray(a) for a in (
        lon, lat, 3 * ones, ones, amp, 10 * ones, 0 * ones)))
    assert int(np.asarray(flux_mod.region_mask(
        traj, (15.0, 25.0), (-5.0, 5.0))).sum()) == 1
    stats = flux_mod.region_statistics(traj, (15.0, 25.0), (-5.0, 5.0),
                                       2 * HOUR)
    assert stats.n_passing == 1
    # Empty region: aggregates are NaN, sources empty -- no crash.
    none = flux_mod.region_statistics(traj, (200.0, 210.0), (-5.0, 5.0),
                                      2 * HOUR)
    assert none.n_passing == 0 and np.isnan(none.mean_entry_time)
    assert none.source_lon.size == 0


def test_wrf_universal_cli(tmp_path):
    """The WRF_universal-equivalent file driver: trajectory file in, flux
    maps + region aggregates out."""
    from rwrt_tpu.diagnostics import wrf_cli
    from rwrt_tpu.io import ncio

    traj = _toy_traj()
    tpath = str(tmp_path / "traj.npz")
    ncio.write_trajectories(traj, tpath)
    opath = str(tmp_path / "wrf.npz")
    rc = wrf_cli.main([
        "--traj", tpath, "--out", opath,
        "--lon-range", "15", "25", "--lat-range", "-2", "10",
        "--mwn-max", "100", "--weight", "count",
        "--tstep", str(2 * HOUR),
    ])
    assert rc == 0
    with np.load(opath) as d:
        # mwn_max drops slot-0 step 3; region selection keeps both live rays.
        assert int(d["count"].sum()) == 5
        assert int(d["n_passing"]) == 2
        np.testing.assert_allclose(float(d["mean_entry_time"]), 2 * HOUR)


def test_wrf_cli_multi_file_aggregation(tmp_path):
    """Several trajectory files (an ensemble's per-member outputs)
    aggregate into one flux product, equal to binning the union."""
    from rwrt_tpu.diagnostics import wrf_cli
    from rwrt_tpu.io import ncio

    import jax.numpy as jnp

    one = _toy_traj()
    # two "members": the toy set and a copy shifted 5 degrees east
    shifted = type(one)(one.lon + np.radians(5.0), *one[1:])
    traj = type(one)(*(jnp.concatenate([np.asarray(a), np.asarray(b)], axis=2)
                       for a, b in zip(one, shifted)))
    whole = str(tmp_path / "whole.npz")
    ncio.write_trajectories(traj, whole)
    parts = []
    for i, member in enumerate((one, shifted)):
        p = str(tmp_path / f"m{i}.npz")
        ncio.write_trajectories(member, p)
        parts.append(p)

    out_multi = str(tmp_path / "wrf_multi.npz")
    out_whole = str(tmp_path / "wrf_whole.npz")
    common = ["--weight", "count", "--tstep", str(2 * HOUR),
              "--lon-range", "15", "25", "--lat-range", "-2", "10"]
    assert wrf_cli.main(["--traj", *parts, "--out", out_multi] + common) == 0
    assert wrf_cli.main(["--traj", whole, "--out", out_whole] + common) == 0
    with np.load(out_multi) as a, np.load(out_whole) as b:
        np.testing.assert_array_equal(a["count"], b["count"])
        np.testing.assert_allclose(a["flux_u"], b["flux_u"], rtol=0, atol=0)
        assert int(a["n_passing"]) == int(b["n_passing"])


def test_longitude_three_circle_scope():
    """A ray circling the globe eastward keeps accumulating longitude past
    360 deg instead of wrapping (manual: -360..720 scope)."""
    nt = 10
    shape = (nt, 1, 1, 1)
    lon = np.radians(np.arange(nt) * 60.0).reshape(shape)  # 1.5 laps
    lat = np.zeros(shape)
    ones = np.ones(shape)
    traj = RayTrajectories(*(jnp.asarray(a) for a in (
        lon, lat, 3 * ones, ones, ones, 30 * ones, 0 * ones)))
    un = np.degrees(np.asarray(flux_mod._unwrap_lon(traj.lon)))[:, 0, 0, 0]
    np.testing.assert_allclose(un, np.arange(nt) * 60.0, atol=1e-9)
    wrf = flux_mod.wave_ray_flux(traj, nlon_bins=36, nlat_bins=18,
                                 weight="count")
    # 540 deg of travel: points beyond 360 land in the third circle.
    cnt = np.asarray(wrf.count)
    third_circle = cnt[int((360 + 360) / 30):, :]
    assert third_circle.sum() >= 2


def test_ensemble_flux_statistics(tmp_path):
    """--ensemble-stats writes per-member mean/std maps: mean = (f1+f2)/2,
    std = |f1-f2|/2 cellwise for two members; pooled maps are their sum."""
    from rwrt_tpu.diagnostics import flux, wrf_cli
    from rwrt_tpu.io import ncio

    one = _toy_traj()
    shifted = type(one)(one.lon + np.radians(5.0), *one[1:])

    mean, std = flux.ensemble_flux_statistics([one, shifted], weight="count")
    f1 = flux.wave_ray_flux(one, weight="count")
    f2 = flux.wave_ray_flux(shifted, weight="count")
    for k in ("flux_u", "flux_v", "amp_sum", "count"):
        a1, a2 = np.asarray(getattr(f1, k)), np.asarray(getattr(f2, k))
        np.testing.assert_allclose(np.asarray(getattr(mean, k)),
                                   0.5 * (a1 + a2), atol=1e-12, err_msg=k)
        np.testing.assert_allclose(np.asarray(getattr(std, k)),
                                   0.5 * np.abs(a1 - a2), atol=1e-12,
                                   err_msg=k)

    parts = []
    for i, member in enumerate((one, shifted)):
        p = str(tmp_path / f"m{i}.npz")
        ncio.write_trajectories(member, p)
        parts.append(p)
    opath = str(tmp_path / "wrf_ens.npz")
    rc = wrf_cli.main(["--traj", *parts, "--out", opath, "--weight", "count",
                       "--ensemble-stats"])
    assert rc == 0
    with np.load(opath) as d:
        np.testing.assert_allclose(d["count_mean"], np.asarray(mean.count),
                                   atol=1e-12)
        np.testing.assert_allclose(d["count_std"], np.asarray(std.count),
                                   atol=1e-12)
        # pooled map = sum over members = 2x the member mean
        np.testing.assert_allclose(d["count"], 2.0 * d["count_mean"],
                                   atol=1e-12)


def test_ensemble_stats_needs_two_files(tmp_path):
    from rwrt_tpu.diagnostics import wrf_cli
    from rwrt_tpu.io import ncio
    import pytest as _pytest

    p = str(tmp_path / "m0.npz")
    ncio.write_trajectories(_toy_traj(), p)
    with _pytest.raises(SystemExit):
        wrf_cli.main(["--traj", p, "--out", str(tmp_path / "o.npz"),
                      "--ensemble-stats"])


def _circling_traj(nt=22):
    """One ray circling the globe westward (unwrap crosses -360), one
    eastward past +360, one dying mid-run -- stress for the blockwise
    longitude-unwrap carry."""
    shape = (nt, 3, 1, 1)
    lon = np.full(shape, np.nan)
    lat = np.full(shape, np.nan)
    ones = np.ones(nt)
    lon[:, 0, 0, 0] = np.radians(10.0 - 55.0 * np.arange(nt))   # westward
    lon[:, 1, 0, 0] = np.radians(5.0 + 60.0 * np.arange(nt))    # eastward
    lon[: nt // 2, 2, 0, 0] = np.radians(40.0 + 20.0 * np.arange(nt // 2))
    lat[:, 0, 0, 0] = np.radians(30.0)
    lat[:, 1, 0, 0] = np.radians(-20.0)
    lat[: nt // 2, 2, 0, 0] = np.radians(5.0)
    kx = np.where(np.isfinite(lon), 3.0, np.nan)
    ky = np.where(np.isfinite(lon), 1.5, np.nan)
    amp = np.where(np.isfinite(lon), 1.0 + 0.1 * np.arange(nt)[:, None, None, None], np.nan)
    ug = np.where(np.isfinite(lon), 25.0, np.nan)
    vg = np.where(np.isfinite(lon), 5.0 * ones[:, None, None, None], np.nan)
    return RayTrajectories(*(jnp.asarray(a) for a in
                             (lon, lat, kx, ky, amp, ug, vg)))


def test_chunked_flux_equals_one_shot():
    """wave_ray_flux_chunked == wave_ray_flux for every map, across
    non-dividing block sizes, thresholds, region selection, and rays whose
    unwrapped longitude crosses block boundaries and the +-360 clip."""
    traj = _circling_traj()
    kw = dict(weight="amp_cg", mwn_max=100.0, speed_min=1.0)
    ref = flux_mod.wave_ray_flux(traj, **kw)
    for blk in (3, 7, 22, 50):
        got = flux_mod.wave_ray_flux_chunked(traj, time_block=blk, **kw)
        for k in ("flux_u", "flux_v", "amp_sum", "count"):
            np.testing.assert_allclose(
                np.asarray(getattr(got, k)), np.asarray(getattr(ref, k)),
                rtol=0, atol=1e-10, err_msg=f"{k} blk={blk}")

    # With Fun2 region selection (the two-pass path).
    kw2 = dict(weight="count", lon_range=(0.0, 60.0), lat_range=(0.0, 40.0))
    ref2 = flux_mod.wave_ray_flux(traj, **kw2)
    got2 = flux_mod.wave_ray_flux_chunked(traj, time_block=4, **kw2)
    for k in ("flux_u", "flux_v", "amp_sum", "count"):
        np.testing.assert_allclose(
            np.asarray(getattr(got2, k)), np.asarray(getattr(ref2, k)),
            rtol=0, atol=1e-10, err_msg=k)

    # And on the hand-built toy set (dead lanes, rootless lanes).
    toy = _toy_traj()
    ref3 = flux_mod.wave_ray_flux(toy, weight="cg")
    got3 = flux_mod.wave_ray_flux_chunked(toy, time_block=3, weight="cg")
    for k in ("flux_u", "flux_v", "amp_sum", "count"):
        np.testing.assert_allclose(
            np.asarray(getattr(got3, k)), np.asarray(getattr(ref3, k)),
            rtol=0, atol=1e-12, err_msg=k)


def test_region_statistics_time_block_equals_one_shot():
    """Blockwise region statistics chain the first-entry search and the
    path-length cumsum exactly across block boundaries."""
    for traj in (_toy_traj(), _circling_traj()):
        ref = flux_mod.region_statistics(traj, (0.0, 60.0), (0.0, 40.0),
                                         2 * HOUR)
        for blk in (1, 3, 5, 100):
            got = flux_mod.region_statistics(traj, (0.0, 60.0), (0.0, 40.0),
                                             2 * HOUR, time_block=blk)
            assert got.n_passing == ref.n_passing, blk
            np.testing.assert_array_equal(got.first_entry_step,
                                          ref.first_entry_step)
            np.testing.assert_allclose(got.mean_entry_time,
                                       ref.mean_entry_time, equal_nan=True)
            np.testing.assert_allclose(got.mean_speed, ref.mean_speed,
                                       rtol=1e-12, equal_nan=True)
            np.testing.assert_allclose(got.source_lon, ref.source_lon)
            np.testing.assert_allclose(got.source_lat, ref.source_lat)


def test_time_block_validation(tmp_path):
    """Non-positive time_block is rejected everywhere (a negative block
    would silently produce all-zero maps)."""
    import pytest as _pytest

    traj = _toy_traj()
    with _pytest.raises(ValueError, match="time_block"):
        flux_mod.wave_ray_flux_chunked(traj, time_block=-3)
    with _pytest.raises(ValueError, match="time_block"):
        flux_mod.wave_ray_flux_chunked(traj, time_block=0)
    with _pytest.raises(ValueError, match="time_block"):
        flux_mod.region_statistics(traj, (0.0, 60.0), (0.0, 40.0), 2 * HOUR,
                                   time_block=-1)
    from rwrt_tpu.diagnostics import wrf_cli
    from rwrt_tpu.io import ncio

    p = str(tmp_path / "t.npz")
    ncio.write_trajectories(traj, p)
    with _pytest.raises(SystemExit):
        wrf_cli.main(["--traj", p, "--out", str(tmp_path / "o.npz"),
                      "--time-block", "-3"])


def test_ensemble_stats_with_time_block(tmp_path):
    """--ensemble-stats composes with --time-block: same mean/std maps, and
    the pooled maps equal n x the member mean."""
    from rwrt_tpu.diagnostics import wrf_cli
    from rwrt_tpu.io import ncio

    one = _toy_traj()
    shifted = type(one)(one.lon + np.radians(5.0), *one[1:])
    parts = []
    for i, member in enumerate((one, shifted)):
        p = str(tmp_path / f"m{i}.npz")
        ncio.write_trajectories(member, p)
        parts.append(p)

    out_a = str(tmp_path / "a.npz")
    out_b = str(tmp_path / "b.npz")
    common = ["--weight", "count", "--ensemble-stats"]
    assert wrf_cli.main(["--traj", *parts, "--out", out_a] + common) == 0
    assert wrf_cli.main(["--traj", *parts, "--out", out_b,
                         "--time-block", "2"] + common) == 0
    with np.load(out_a) as a, np.load(out_b) as b:
        for k in ("count", "count_mean", "count_std", "flux_u_mean"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-12, err_msg=k)
        np.testing.assert_allclose(a["count"], 2.0 * a["count_mean"],
                                   atol=1e-12)
