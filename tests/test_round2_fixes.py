"""Round-2 correctness fixes: FSAL-resume with time-varying backgrounds,
small-nt guards, grid-spacing validation + regrid, reference slot-order
output, run-level death accounting, exact termination classification."""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig
from rwrt_tpu.models.basic_state import prepare_time_varying, regrid_to_uniform
from rwrt_tpu.utils.checkpoint import trace_rays_chunked

HOUR, DAY = 3600.0, 86400.0
pi_ = np.pi

CFG = dict(
    zwn=(2.0, 4.0), sw_lon=0.0, sw_lat=10.0, dlon=90.0, dlat=10.0,
    nnx=2, nny=2, tstep=2 * HOUR, ttotal=4 * DAY, cal_dtype="float64",
)


def _assert_traj_equal(a, b, atol=1e-11):
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, k)), np.asarray(getattr(b, k)),
            rtol=0, atol=atol, equal_nan=True, err_msg=k,
        )


@pytest.fixture(scope="module")
def tv_bs(jet_field):
    u, v, lat, lon = jet_field
    return prepare_time_varying(
        np.stack([u, 1.4 * u, 0.8 * u]), np.stack([v, v, 1.5 * v]), lat, lon,
        bg_t0=0.0, bg_dt=1.5 * DAY, cal_dtype="float64",
    )


def test_checkpoint_resume_time_varying(tv_bs, tmp_path):
    """Resume must recompute the FSAL carry at each ray's OWN time: for a
    time-varying background a t=0 carry would sample the wrong frame
    (ADVICE.md round-1 medium finding)."""
    cfg = RunConfig(integrator="rk45", **CFG)
    full = trace_rays_chunked(tv_bs, cfg, chunk_steps=10, verbose=False)

    ckpt = str(tmp_path / "tv.npz")
    partial = RunConfig(**{**CFG, "ttotal": 2 * DAY, "integrator": "rk45"})
    trace_rays_chunked(tv_bs, partial, chunk_steps=10, verbose=False,
                       checkpoint_path=ckpt)
    resumed = trace_rays_chunked(tv_bs, cfg, chunk_steps=10, verbose=False,
                                 checkpoint_path=ckpt, resume=True)
    _assert_traj_equal(full, resumed)


def test_single_interval_run(jet_field):
    """nt == 2 and nt == 1 must not crash the grouped adaptive driver
    (round-1 ADVICE: group = min(interval_batch, nt-1) could hit 0)."""
    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    for ttotal in (2 * HOUR, 1 * HOUR):
        cfg = RunConfig(**{**CFG, "ttotal": ttotal}, integrator="rk45",
                        interval_batch=16)
        traj = rt.trace_rays(bs, cfg)
        assert np.asarray(traj.lon).shape[0] == cfg.nt
        assert np.isfinite(np.asarray(traj.lon[0])).all()


def test_gaussian_grid_refused(jet_field):
    """Non-uniform (Gaussian) latitudes must raise, never silently drift
    (the compute pipeline assumes uniform spacing)."""
    u, v, lat, lon = jet_field
    nodes, _ = np.polynomial.legendre.leggauss(lat.shape[0])
    gauss_lat = np.arcsin(nodes)
    with pytest.raises(ValueError, match="not the uniform"):
        rt.prepare(u, v, gauss_lat, lon)
    # Regional (partial-coverage) uniform grids are refused too: dy is
    # derived from the count assuming pole-to-pole.
    with pytest.raises(ValueError, match="not the uniform"):
        rt.prepare(u, v, np.linspace(-1.0, 1.0, lat.shape[0]), lon)


def test_float32_stored_coordinates_accepted(jet_field):
    """Coordinate variables are often stored as float32 in NetCDF; a
    genuinely uniform grid round-tripped through f32 must not be rejected
    (review finding)."""
    u, v, lat, lon = jet_field
    lat32 = lat.astype(np.float32).astype(np.float64)
    lon32 = lon.astype(np.float32).astype(np.float64)
    bs = rt.prepare(u, v, lat32, lon32)
    assert bs.nlat == lat.shape[0]


def test_regrid_to_uniform(jet_field):
    """Gaussian-grid input regrids onto the uniform grid within bilinear
    interpolation error of the analytic field."""
    u, v, lat, lon = jet_field
    nodes, _ = np.polynomial.legendre.leggauss(49)
    glat = np.arcsin(nodes)
    gu = 20.0 * np.cos(glat)[None, :] ** 2 * np.ones((lon.shape[0], 1))
    gv = 3.0 * np.sin(lon)[:, None] * np.cos(glat)[None, :]
    ru, rv, rlat, rlon = regrid_to_uniform(gu, gv, glat, lon)
    bs = rt.prepare(ru, rv, rlat, rlon, cal_dtype="float64")  # must not raise
    # Interior rows only: a Gaussian grid does not reach the poles, so the
    # pole rows are clamped to the outermost source latitude.
    want_u = 20.0 * np.cos(rlat)[None, :] ** 2
    assert np.max(np.abs(ru - want_u)[:, 1:-1]) < 0.05  # curvature error
    want_v = 3.0 * np.sin(rlon)[:, None] * np.cos(rlat)[None, :]
    assert np.max(np.abs(rv - want_v)[:, 1:-1]) < 0.05
    assert bs.nlat == 49


def test_regrid_to_uniform_negative_lon_convention(jet_field):
    """A source grid on the -180..180 longitude convention must regrid
    correctly: targets above the source window's end (e.g. 200 deg) wrap
    into [lon0, lon0+2pi), they do not clamp to the last source column."""
    u, v, lat, lon = jet_field
    lon_neg = lon - pi_  # [-pi, pi)
    gu = 20.0 * np.cos(lat)[None, :] ** 2 * (1.0 + 0.3 * np.sin(lon_neg))[:, None]
    gv = 3.0 * np.sin(lon_neg)[:, None] * np.cos(lat)[None, :]
    ru, rv, rlat, rlon = regrid_to_uniform(gu, gv, lat, lon_neg)
    want_u = 20.0 * np.cos(rlat)[None, :] ** 2 * (1.0 + 0.3 * np.sin(rlon))[:, None]
    want_v = 3.0 * np.sin(rlon)[:, None] * np.cos(rlat)[None, :]
    assert np.max(np.abs(ru - want_u)) < 0.05
    assert np.max(np.abs(rv - want_v)) < 0.05


def test_fortran_root_order_matches_reference_slots(jet_field):
    """root_order='fortran' reproduces the reference's slot layout EXACTLY
    (np.roots eigenvalue order + change_roots_order), slot by slot."""
    import jax.numpy as jnp

    from refshim import load_reference
    from rwrt_tpu import tracer
    from rwrt_tpu.models import ray as ray_mod

    bs_mod, _, _ = load_reference()
    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    bg = tracer.make_background(bs, 0.0)
    rng = np.random.default_rng(3)
    slon = jnp.asarray(rng.uniform(0, 2 * np.pi, 60))
    slat = jnp.asarray(np.radians(rng.uniform(-70, 70, 60)))
    zwns = [1.0, 3.0, 5.0, 7.0]
    y0, _, _ = tracer.initialize(bg, slon, slat, jnp.asarray(zwns),
                                 root_order="fortran")
    ky = np.asarray(y0[3]).reshape(3, 60, len(zwns))
    f = np.asarray(ray_mod.sample_bg(bg, slon, slat, 0.0))
    for zi, k in enumerate(zwns):
        ref, _ = bs_mod.cal_ky_numpy(f[0], f[1], f[6], f[7], 0.0, k,
                                     root_method="numpy")
        np.testing.assert_allclose(
            ky[:, :, zi].T, ref, rtol=0, atol=1e-9, equal_nan=True,
            err_msg=f"zwn={k}",
        )


def test_fortran_root_order_is_lane_permutation(jet_field):
    """A fortran-order run must be a per-(source, zwn) slot permutation of
    the canonical run -- identical trajectories, relabeled slots."""
    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    cfg_c = RunConfig(integrator="rk4", **CFG)
    cfg_f = RunConfig(integrator="rk4", root_order="fortran", **CFG)
    a = rt.trace_rays(bs, cfg_c)
    b = rt.trace_rays(bs, cfg_f)
    ka = np.asarray(a.ky[0])
    kb = np.asarray(b.ky[0])
    la = np.asarray(a.lat)
    lb = np.asarray(b.lat)
    ns, nz = ka.shape[1], ka.shape[2]
    for s in range(ns):
        for z in range(nz):
            key_a = np.where(np.isnan(ka[:, s, z]), 9e9, ka[:, s, z])
            key_b = np.where(np.isnan(kb[:, s, z]), 9e9, kb[:, s, z])
            np.testing.assert_allclose(np.sort(key_a), np.sort(key_b),
                                       atol=1e-9)
            perm = [int(np.argmin(np.abs(key_a - key_b[i])))
                    for i in range(3)]
            np.testing.assert_allclose(
                lb[:, :, s, z], la[:, perm, s, z], rtol=0, atol=1e-9,
                equal_nan=True,
            )


def test_all_dead_early_stop(jet_field, capsys):
    """When every born ray dies, the chunked driver must stop integrating and
    report it (the reference's early exit, wr.py:735-736), with the same
    all-NaN tail as the full run."""
    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    # A displacement threshold so small every moving ray is killed at its
    # first output step.
    cfg = RunConfig(**{**CFG, "cut_off": 1e-9}, integrator="rk45")
    full = rt.trace_rays(bs, cfg)
    chunked = trace_rays_chunked(bs, cfg, chunk_steps=6, verbose=True)
    out = capsys.readouterr().out
    assert "terminated by output step" in out
    assert "termination summary" in out
    _assert_traj_equal(full, chunked)


def test_termination_classify_exact(jet_field):
    """classify() recovers exact kill causes by re-running the killing
    interval; the tiny-cut_off run must classify every death as 'jump'."""
    from rwrt_tpu.diagnostics.termination import analyze, classify

    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    cfg = RunConfig(**{**CFG, "cut_off": 1e-9, "ttotal": 1 * DAY},
                    integrator="rk45")
    traj = rt.trace_rays(bs, cfg)
    rep = classify(traj, bs, cfg)
    base = analyze(traj)
    died = int(((base.death_step >= 1)
                & (base.death_step < cfg.nt)).sum())
    assert died > 0
    assert rep.counts["jump"] == died
    assert rep.counts["polar"] == 0 and rep.counts["other"] == 0
    assert sum(rep.counts.values()) == base.death_step.size


def test_streamed_history_equals_in_memory(jet_field, tmp_path):
    """stream_dir writes the history to memmapped .npy files chunk by chunk;
    results must equal the in-memory chunked run bitwise, survive a
    checkpoint resume, and be reopenable from disk."""
    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    cfg = RunConfig(integrator="rk45", **CFG)
    mem = trace_rays_chunked(bs, cfg, chunk_steps=10, verbose=False)
    sdir = str(tmp_path / "stream")
    st = trace_rays_chunked(bs, cfg, chunk_steps=10, verbose=False,
                            stream_dir=sdir)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(mem, k)), np.asarray(getattr(st, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k)
    # The files are reopenable after the run.
    lon_file = np.load(str(tmp_path / "stream" / "lon.npy"), mmap_mode="r")
    assert lon_file.shape[0] == cfg.nt

    # Streamed + checkpointed: resume completes with identical output.
    sdir2 = str(tmp_path / "stream2")
    ckpt = str(tmp_path / "s.npz")
    partial = RunConfig(**{**CFG, "ttotal": 2 * DAY, "integrator": "rk45"})
    trace_rays_chunked(bs, partial, chunk_steps=10, verbose=False,
                       stream_dir=sdir2, checkpoint_path=ckpt)
    res = trace_rays_chunked(bs, cfg, chunk_steps=10, verbose=False,
                             stream_dir=sdir2, checkpoint_path=ckpt,
                             resume=True)
    for k in ("lon", "lat", "amp"):
        np.testing.assert_allclose(
            np.asarray(getattr(mem, k)), np.asarray(getattr(res, k)),
            rtol=0, atol=1e-11, equal_nan=True, err_msg=k)


def test_auto_chunk_routing(jet_field):
    """Past the device-memory estimate trace_rays transparently reroutes
    through the chunked (host-accumulating) driver with equal results."""
    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    cfg = RunConfig(integrator="rk45", **CFG)
    fused = rt.trace_rays(bs, cfg, auto_chunk_bytes=None)
    routed = rt.trace_rays(bs, cfg, auto_chunk_bytes=1)  # force rerouting
    _assert_traj_equal(fused, routed)
    # Default threshold leaves small runs on the fused path (same object
    # shapes either way; just assert it still runs).
    small = rt.trace_rays(bs, cfg)
    _assert_traj_equal(fused, small)


@pytest.mark.parametrize("integrator", ["rk4", "rk45"])
def test_rootless_compaction_invariance(jet_field, integrator):
    """compact_rootless drops never-born lanes from the device batch and
    reconstructs their frozen history on host; results must equal the
    uncompacted run (NaN masks exactly; values within XLA codegen ULP wobble
    from the different lane count)."""
    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    base = dict(CFG)
    base["zwn"] = (2.0, 4.0, 6.0)  # ensure plenty of rootless slots
    off = rt.trace_rays(bs, RunConfig(integrator=integrator,
                                      compact_rootless=False, **base))
    on = rt.trace_rays(bs, RunConfig(integrator=integrator, **base))
    n_lanes = np.asarray(off.amp[0]).size
    n_born = int(np.isfinite(np.asarray(off.amp[0])).sum())
    assert n_born < n_lanes  # the case is non-trivial
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        x = np.asarray(getattr(off, k))
        y = np.asarray(getattr(on, k))
        np.testing.assert_array_equal(np.isnan(x), np.isnan(y), err_msg=k)
        np.testing.assert_allclose(x, y, rtol=0, atol=1e-6, equal_nan=True,
                                   err_msg=k)
    # chunked driver path too
    ch = trace_rays_chunked(bs, RunConfig(integrator=integrator, **base),
                            chunk_steps=9, verbose=False)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(on, k)), np.asarray(getattr(ch, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k)


def test_termination_analyze_rootless_not_survivors(jet_field):
    """Rootless lanes (finite frozen seed position, NaN amp) must count as
    'no_root', not as survivors."""
    from rwrt_tpu.diagnostics.termination import analyze

    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    cfg = RunConfig(**{**CFG, "ttotal": 1 * DAY}, integrator="rk4")
    traj = rt.trace_rays(bs, cfg)
    rep = analyze(traj)
    amp0 = np.asarray(traj.amp[0])
    assert rep.counts["no_root"] == int((~np.isfinite(amp0)).sum())
    assert sum(rep.counts.values()) == amp0.size


def test_rhs_nan_amp_poisons_only_amp_row(jet_field):
    """IEEE propagation parity for a NaN amplitude (reference core_diffun,
    wr.py:44-82): damp/dt = amp*(...) is the ONLY derivative that involves
    amp, so a NaN-amp / finite-position lane keeps finite rows 0-3 and
    keeps advancing until the next interval entry freezes it
    (rkf45.py:400-403) -- it must NOT be all-row killed. NaN wavenumbers,
    by contrast, poison every row (through kappa and the group velocity)."""
    import jax.numpy as jnp

    from rwrt_tpu import tracer
    from rwrt_tpu.models import ray as ray_mod

    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    bg = tracer.make_background(bs, 0.0)

    lon0 = jnp.asarray([0.5, 0.5, 0.5])
    lat0 = jnp.asarray([0.4, 0.4, 0.4])
    kx = jnp.asarray([3.0, 3.0, 3.0])
    ky = jnp.asarray([2.0, 2.0, jnp.nan])
    amp = jnp.asarray([1.0, jnp.nan, 1.0])
    y = jnp.stack([lon0, lat0, kx, ky, amp])

    dy, err = ray_mod.rhs(bg, y)
    dy = np.asarray(dy)
    # Lane 0 (all finite): every row finite.
    assert np.isfinite(dy[:, 0]).all()
    # Lane 1 (NaN amp only): rows 0-3 finite AND equal to the healthy
    # lane's (amp feeds no other derivative); row 4 NaN.
    np.testing.assert_array_equal(dy[:4, 1], dy[:4, 0])
    assert np.isnan(dy[4, 1])
    # Lane 2 (NaN ky): every row NaN.
    assert np.isnan(dy[:, 2]).all()
    assert not np.asarray(err)[1]  # NaN amp is not an err-mask condition
