"""Round-2 self-review fixes: dense-mode config validation, float32 DH
grids, blockwise (memmap-safe) termination accounting, empty-region WRF
output parity."""

import os

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig
from rwrt_tpu.diagnostics import spectral
from rwrt_tpu.diagnostics.termination import analyze, death_steps
from rwrt_tpu.tracer import RayTrajectories
from rwrt_tpu.utils.checkpoint import trace_rays_chunked

HOUR, DAY = 3600.0, 86400.0

CFG = dict(
    zwn=(2.0, 4.0), sw_lon=0.0, sw_lat=10.0, dlon=90.0, dlat=10.0,
    nnx=2, nny=2, tstep=2 * HOUR, ttotal=4 * DAY, cal_dtype="float64",
)


# ---------------------------------------------------------------------------
# bound_mode='dense' must never silently fall back to the exact clamped path
# ---------------------------------------------------------------------------

def test_dense_requires_rk45():
    cfg = RunConfig(**CFG, integrator="rk4", bound_mode="dense")
    with pytest.raises(ValueError, match="rk45"):
        cfg.validate()


def test_dense_requires_interval_batching():
    cfg = RunConfig(**CFG, integrator="rk45", bound_mode="dense",
                    interval_batch=1)
    with pytest.raises(ValueError, match="interval_batch"):
        cfg.validate()


def test_dense_requires_multiple_intervals():
    cfg = RunConfig(**{**CFG, "ttotal": 2 * HOUR}, integrator="rk45",
                    bound_mode="dense")
    with pytest.raises(ValueError, match="nt"):
        cfg.validate()


def test_dense_default_config_still_valid():
    RunConfig(**CFG, integrator="rk45", bound_mode="dense").validate()


# ---------------------------------------------------------------------------
# DH spectral mode accepts float32-stored coordinates
# ---------------------------------------------------------------------------

def _dh_lat(n):
    return np.pi / 2 - np.pi * np.arange(n)[::-1] / n


def test_dh_mode_accepts_float32_latitudes():
    """A genuine DH grid whose latitudes passed through float32 storage
    (~1.2e-7 rad rounding near the pole) must not be rejected -- the same
    coordinate-rounding policy basic_state applies to uniform grids."""
    n = 32
    rng = np.random.default_rng(0)
    field = rng.standard_normal((8, n))
    lat64 = _dh_lat(n)
    lat32 = lat64.astype(np.float32).astype(np.float64)
    assert np.max(np.abs(lat32 - lat64)) > 1e-9  # would fail the old atol
    got32 = spectral.spectral_filter(field, lat32, lmax=10, mode="dh")
    got64 = spectral.spectral_filter(field, lat64, lmax=10, mode="dh")
    np.testing.assert_allclose(np.asarray(got32), np.asarray(got64),
                               rtol=0, atol=1e-12)


def test_dh_mode_still_rejects_regular_grid():
    """An equally-spaced pole-to-pole grid (spacing pi/(n-1), not the DH
    pi/n) stays rejected: the widened tolerance must not blur grid types."""
    n = 32
    lat = np.linspace(-np.pi / 2, np.pi / 2, n)
    with pytest.raises(ValueError, match="Driscoll"):
        spectral.spectral_filter(np.zeros((8, n)), lat, lmax=10, mode="dh")


# ---------------------------------------------------------------------------
# Blockwise death accounting: identical to the dense computation, memmap-safe
# ---------------------------------------------------------------------------

def _random_traj(rng, nt=23, shape=(3, 2, 2)):
    amp = rng.standard_normal((nt,) + shape)
    # rootless lanes: NaN from t=0
    rootless = rng.random(shape) < 0.3
    amp[:, rootless] = np.nan
    # born lanes that die at a random step
    death = rng.integers(1, nt + 5, shape)  # > nt means survives
    tgrid = np.arange(nt).reshape(-1, 1, 1, 1)
    amp[(tgrid >= death.reshape((1,) + shape)) & ~rootless[None]] = np.nan
    lat = rng.uniform(-np.pi / 2, np.pi / 2, (nt,) + shape)
    z = np.zeros_like(amp)
    return RayTrajectories(lon=z, lat=lat, kx=z, ky=z, amp=amp,
                           ug=z, vg=z), rootless, death


def test_death_steps_blockwise_matches_bruteforce():
    rng = np.random.default_rng(7)
    traj, rootless, death = _random_traj(rng)
    nt = np.asarray(traj.amp).shape[0]
    for block in (1, 3, 64):
        ds, born, alive = death_steps(traj, block=block)
        np.testing.assert_array_equal(born, ~rootless)
        want = np.where(rootless, -1, np.minimum(death, nt))
        np.testing.assert_array_equal(ds, want)
        np.testing.assert_array_equal(
            alive, np.isfinite(np.asarray(traj.amp)).sum(axis=(1, 2, 3)))


def test_analyze_on_memmap_traj(tmp_path):
    """analyze() over memmap-backed history (the stream_dir layout) equals
    the in-memory result without materializing full-history temporaries."""
    rng = np.random.default_rng(11)
    traj, _, _ = _random_traj(rng)
    mm = {}
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        a = np.asarray(getattr(traj, k))
        m = np.lib.format.open_memmap(
            str(tmp_path / f"{k}.npy"), mode="w+", dtype=a.dtype,
            shape=a.shape)
        m[:] = a
        m.flush()
        mm[k] = np.load(str(tmp_path / f"{k}.npy"), mmap_mode="r")
    rep_mm = analyze(RayTrajectories(**mm))
    rep = analyze(traj)
    np.testing.assert_array_equal(rep_mm.death_step, rep.death_step)
    np.testing.assert_array_equal(rep_mm.alive_frac, rep.alive_frac)
    assert rep_mm.counts == rep.counts


# ---------------------------------------------------------------------------
# WRF writer: empty region -> genuinely empty passing arrays (nc branch)
# ---------------------------------------------------------------------------

def test_wrf_netcdf_empty_region(tmp_path):
    nc = pytest.importorskip("netCDF4")
    if getattr(nc, "__file__", None) is None:
        pytest.skip("netCDF4 in sys.modules is the refshim stub, not a "
                    "real installation")
    from rwrt_tpu.diagnostics import flux as flux_mod
    from rwrt_tpu.diagnostics.wrf_cli import write_flux

    u, v, lat, lon = _jet()
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    cfg = RunConfig(**{**CFG, "ttotal": 1 * DAY}, integrator="rk4")
    traj = rt.trace_rays(bs, cfg)
    wrf = flux_mod.wave_ray_flux(traj)
    stats = flux_mod.region_statistics(traj, (0.0, 0.1), (89.0, 89.5),
                                       cfg.tstep)  # no ray reaches this box
    assert stats.n_passing == 0
    path = write_flux(wrf, str(tmp_path / "w.nc"), stats)
    with nc.Dataset(path) as ds:
        assert ds["source_lon"].shape == (0,)
        assert ds["source_lat"].shape == (0,)


def _jet():
    nlat, nlon = 37, 72
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    u = 20 * np.cos(lat)[None, :] ** 2 + 0 * lon[:, None]
    v = 2 * np.sin(lon)[:, None] * np.cos(lat)[None, :]
    return u, v, lat, lon


# ---------------------------------------------------------------------------
# validate() rejects degenerate numeric settings
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("overrides,match", [
    (dict(zwn=()), "zwn"),
    (dict(rtol=0.0), "rtol"),
    (dict(atol=-1e-6), "rtol and atol"),
    (dict(interval_batch=0), "interval_batch"),
    (dict(min_step_factor=-1.0), "min_step_factor"),
    (dict(cut_off=-0.1), "cut_off"),
])
def test_validate_rejects_degenerate_settings(overrides, match):
    cfg = RunConfig(**{**CFG, **overrides})
    with pytest.raises(ValueError, match=match):
        cfg.validate()


def _assert_traj_equal(a, b, atol=0.0):
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, k)), np.asarray(getattr(b, k)),
            rtol=0, atol=atol, equal_nan=True, err_msg=k,
        )


# ---- round-2 second review pass (repo-wide) regression tests ----


def test_ode_nan_lane_does_not_spin():
    """A lane with non-finite y0 freezes at NaN with status 1 immediately;
    without the init guard its h became NaN and every interval's while_loop
    ran to max_iters."""
    import jax.numpy as jnp

    from rwrt_tpu.solvers.ode import solve_ivp_batched

    def f(t, y):
        return -y

    y0 = jnp.asarray([[1.0, jnp.nan, 2.0]])
    sol = solve_ivp_batched(f, y0, jnp.asarray([0.5, 1.0]), max_iters=2_000)
    assert int(sol.status[1]) == 1
    assert np.isnan(np.asarray(sol.ys)[:, 0, 1]).all()
    # Healthy lanes unaffected and cheap (a NaN-spun lane would dominate).
    assert int(sol.status[0]) == 0 and int(sol.status[2]) == 0
    np.testing.assert_allclose(np.asarray(sol.ys)[-1, 0, 0], np.exp(-1.0),
                               rtol=1e-6)
    assert int(sol.iters) < 200


def test_flux_full_circle_longitude_range():
    """lon_range spanning the full circle selects every longitude (it used
    to collapse to the single meridian lon == lo0)."""
    from rwrt_tpu.diagnostics import flux
    from rwrt_tpu.tracer import RayTrajectories
    import jax.numpy as jnp

    shape = (1, 3, 1, 1)
    lon = np.full(shape, np.nan)
    lat = np.full(shape, np.nan)
    lon[0, :, 0, 0] = np.radians([10.0, 170.0, 350.0])
    lat[0, :, 0, 0] = np.radians([30.0, 30.0, 30.0])
    amp = np.where(np.isfinite(lon), 1.0, np.nan)
    traj = RayTrajectories(*(jnp.asarray(a) for a in
                             (lon, lat, lon, lon, amp, amp, amp)))
    for rng in ((0.0, 360.0), (-180.0, 180.0)):
        mask = np.asarray(flux.region_mask(traj, rng, (0.0, 60.0)))
        assert mask.all(), rng


def test_config_rejects_southern_overrun():
    """Negative dlat / deep-south sw_lat must not seed past the pole (the
    reference guard checks only the northern end)."""
    from rwrt_tpu.config import RunConfig

    with pytest.raises(ValueError, match="source latitude"):
        RunConfig(zwn=(3.0,), sw_lat=-80.0, dlat=-2.0, nny=15,
                  sw_lon=0.0, dlon=1.0, nnx=1,
                  tstep=7200.0, ttotal=86400.0).validate()
    # Northern check still active.
    with pytest.raises(ValueError, match="source latitude"):
        RunConfig(zwn=(3.0,), sw_lat=80.0, dlat=2.0, nny=15,
                  sw_lon=0.0, dlon=1.0, nnx=1,
                  tstep=7200.0, ttotal=86400.0).validate()


def test_load_basic_state_time_varying_roundtrip(tmp_path, jet_field):
    """write_basic_state/load_basic_state round-trip a TIME-VARYING state:
    the wrap column goes on the longitude axis (it used to be concatenated
    along TIME, silently corrupting the stack) and bg_t0/bg_dt survive."""
    from rwrt_tpu.io import ncio

    u, v, lat, lon = jet_field
    tv = rt.prepare_time_varying(
        np.stack([u, u * 1.1]), np.stack([v, v]), lat, lon,
        bg_t0=3600.0, bg_dt=43200.0, cal_dtype="float64")
    path = str(tmp_path / "bs_tv.npz")
    ncio.write_basic_state(tv, path)
    back = ncio.load_basic_state(path, cal_dtype="float64")
    assert back.fields.shape == tv.fields.shape
    np.testing.assert_allclose(np.asarray(back.fields), np.asarray(tv.fields),
                               rtol=0, atol=1e-12, equal_nan=True)
    assert back.bg_t0 == 3600.0 and back.bg_dt == 43200.0
    # Trajectories through the reloaded state match the original.
    cfg = RunConfig(zwn=(3.0,), sw_lon=10.0, sw_lat=20.0, dlon=1.0, dlat=1.0,
                    nnx=2, nny=1, tstep=7200.0, ttotal=2 * 86400.0,
                    integrator="rk45", cal_dtype="float64")
    _assert_traj_equal(rt.trace_rays(back, cfg), rt.trace_rays(tv, cfg),
                       atol=0.0)


def test_streamed_history_survives_rejected_resume(tmp_path, jet_field):
    """A resume rejected by checkpoint validation must NOT have wiped the
    streamed trajectory memmaps (validation now precedes any file
    mutation)."""
    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    sd = str(tmp_path / "stream")
    ck = str(tmp_path / "ck.npz")
    small = RunConfig(zwn=(3.0,), sw_lon=10.0, sw_lat=20.0, dlon=1.0,
                      dlat=1.0, nnx=2, nny=1, tstep=7200.0,
                      ttotal=2 * 86400.0, integrator="rk45",
                      cal_dtype="float64")
    trace_rays_chunked(bs, small, chunk_steps=8, verbose=False,
                       checkpoint_path=ck, stream_dir=sd)
    lon_before = np.load(os.path.join(sd, "lon.npy")).copy()
    assert np.isfinite(lon_before).any()
    bigger = RunConfig(**{**small.__dict__, "nny": 3})
    with pytest.raises(ValueError):
        trace_rays_chunked(bs, bigger, chunk_steps=8, verbose=False,
                           checkpoint_path=ck, stream_dir=sd)
    lon_after = np.load(os.path.join(sd, "lon.npy"))
    np.testing.assert_array_equal(lon_before, lon_after)


def test_ensemble_rk4_fortran_order_honored(tmp_path, jet_field):
    """The fused ensemble rk4 path honors root_order='fortran' (member
    initialization runs on host, outside the vmap) -- the slot layout
    matches the chunked per-member path exactly."""
    from rwrt_tpu.main import RunPaths, run

    u, v, lat, lon = jet_field
    paths = []
    for i in range(2):
        p = str(tmp_path / f"w{i}.npz")
        np.savez(p, u=u.T * (1.0 + 0.1 * i), v=v.T,
                 lat=np.degrees(lat), lon=np.degrees(lon))
        paths.append(p)
    cfg = RunConfig(zwn=(3.0,), sw_lon=10.0, sw_lat=20.0, dlon=1.0, dlat=1.0,
                    nnx=2, nny=1, tstep=7200.0, ttotal=86400.0,
                    integrator="rk4", root_order="fortran",
                    cal_dtype="float64")
    fused = run(cfg, RunPaths(inputuv=paths), verbose=False)
    chunked = run(cfg, RunPaths(inputuv=paths), verbose=False, chunked=True)
    for a, b in zip(fused, chunked):
        np.testing.assert_allclose(np.asarray(a.ky)[0], np.asarray(b.ky)[0],
                                   rtol=0, atol=0, equal_nan=True)
