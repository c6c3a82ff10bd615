"""IO roundtrip and end-to-end driver tests."""

import numpy as np

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig
from rwrt_tpu.io import ncio
from rwrt_tpu.main import RunPaths, run

HOUR, DAY = 3600.0, 86400.0


def test_load_wind_npz_latflip_and_transpose(tmp_path, jet_field):
    u, v, lat, lon = jet_field
    # store (lat, lon) with DESCENDING latitude like many reanalysis files
    path = str(tmp_path / "wind.npz")
    np.savez(
        path,
        u=u.T[::-1], v=v.T[::-1],
        lat=np.degrees(lat)[::-1], lon=np.degrees(lon),
    )
    u2, v2, lat2, lon2 = ncio.load_wind(path)
    np.testing.assert_allclose(u2, u.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lat2), lat, atol=1e-12)
    assert lat2[0] < lat2[-1]


def test_load_wind_3d_latflip_and_time(tmp_path, jet_field):
    """3-D (time, lat, lon) inputs flip descending latitude per frame and
    return the time coordinate with with_time=True."""
    u, v, lat, lon = jet_field
    frames = np.stack([u, 2 * u, 3 * u])          # (T, nlon, nlat)
    path = str(tmp_path / "wind3d.npz")
    np.savez(
        path,
        u=np.swapaxes(frames, 1, 2)[:, ::-1],     # (T, lat desc, lon)
        v=np.swapaxes(np.stack([v, v, v]), 1, 2)[:, ::-1],
        lat=np.degrees(lat)[::-1], lon=np.degrees(lon),
        time=np.array([0.0, 3600.0, 7200.0]),
    )
    u2, v2, lat2, lon2, t2 = ncio.load_wind(path, with_time=True)
    assert u2.shape == (3,) + u.shape
    np.testing.assert_allclose(u2[1], 2 * u.astype(np.float32), rtol=1e-6)
    assert lat2[0] < lat2[-1]
    np.testing.assert_allclose(t2, [0.0, 3600.0, 7200.0])
    # without with_time: 4-tuple, unchanged legacy shape
    assert len(ncio.load_wind(path)) == 4


def test_basic_state_output_fields(tmp_path, jet_field):
    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    path = str(tmp_path / "bs.npz")
    ncio.write_basic_state(bs, path)
    with np.load(path) as ds:
        # the reference's 23 2-D fields + coords (bs.py:481-505)
        for name in ("u", "v", "q", "ux", "uxx", "uy", "vx", "vxx", "vy",
                     "qx", "qy", "qxx", "qxy", "qyx", "qyy", "qxxx", "qxxy",
                     "qxyy", "qyyy", "qyxx", "qyyx", "betam", "KS",
                     "lon", "lat"):
            assert name in ds.files, name
        assert ds["u"].shape == (bs.nlon, bs.nlat)


def test_run_pipeline_end_to_end(tmp_path, jet_field):
    u, v, lat, lon = jet_field
    inp = str(tmp_path / "wind.npz")
    np.savez(inp, u=u.T, v=v.T, lat=np.degrees(lat), lon=np.degrees(lon))
    cfg = RunConfig(
        zwn=(3.0,), sw_lon=10.0, sw_lat=20.0, dlon=1.0, dlat=1.0,
        nnx=2, nny=1, tstep=2 * HOUR, ttotal=2 * DAY,
        integrator="rk4", cal_dtype="float64",
    )
    paths = RunPaths(
        inputuv=inp,
        bsfile=str(tmp_path / "bs.npz"),
        ncfile=str(tmp_path / "rays.npz"),
    )
    traj = run(cfg, paths, verbose=False)
    out = ncio.load_trajectories(str(tmp_path / "rays.npz"))
    assert out["rlon"].shape == (cfg.nt, 3, 2, 1)
    # degrees conversion happened
    fin = np.isfinite(out["rlat"])
    assert np.abs(out["rlat"][fin]).max() <= 90.0 + 1e-6
    np.testing.assert_allclose(
        out["rlon"][0, 0, 0, 0], 10.0, atol=1e-10
    )
    # in-memory trajectories stay in radians
    np.testing.assert_allclose(
        float(traj.lon[0, 0, 0, 0]), np.radians(10.0), atol=1e-12
    )


def test_run_time_varying_background_end_to_end(tmp_path, jet_field):
    """A 3-D (time, lat, lon) input wind drives the time-varying pipeline
    from the CLI config surface (BASELINE.json config 4), matching the
    library-level prepare_time_varying + trace_rays result exactly."""
    u, v, lat, lon = jet_field
    frames = np.stack([u * (1.0 + 0.1 * i) for i in range(3)])
    vframes = np.stack([v, v, v])
    inp = str(tmp_path / "wind3d.npz")
    # stored (time, lat, lon): transpose the (nlon, nlat) fixture per frame
    np.savez(inp, u=np.swapaxes(frames, 1, 2), v=np.swapaxes(vframes, 1, 2),
             lat=np.degrees(lat), lon=np.degrees(lon))
    cfg = RunConfig(
        zwn=(3.0,), sw_lon=10.0, sw_lat=20.0, dlon=1.0, dlat=1.0,
        nnx=2, nny=1, tstep=2 * HOUR, ttotal=1 * DAY,
        integrator="rk45", cal_dtype="float64", bg_dt=1.0 * DAY,
    )
    paths = RunPaths(inputuv=inp, bsfile=str(tmp_path / "bs3d.npz"),
                     ncfile=str(tmp_path / "rays3d.npz"))
    traj = run(cfg, paths, verbose=False)

    bs = rt.prepare_time_varying(frames, vframes, lat, lon, bg_dt=1.0 * DAY,
                                 cal_dtype="float64")
    ref = rt.trace_rays(bs, cfg)
    np.testing.assert_allclose(np.asarray(traj.lat), np.asarray(ref.lat),
                               rtol=0, atol=1e-12, equal_nan=True)
    # basic-state diagnostics carry the frame axis
    with np.load(str(tmp_path / "bs3d.npz")) as ds:
        assert ds["u"].shape == (3, u.shape[0], u.shape[1])
        assert ds["uxx"].shape == (3, u.shape[0], u.shape[1])

    # frame cadence from the file's own time variable (seconds)
    np.savez(inp, u=np.swapaxes(frames, 1, 2), v=np.swapaxes(vframes, 1, 2),
             lat=np.degrees(lat), lon=np.degrees(lon),
             time=np.arange(3) * DAY)
    import dataclasses

    cfg2 = dataclasses.replace(cfg, bg_dt=0.0)
    traj2 = run(cfg2, RunPaths(inputuv=inp), verbose=False)
    np.testing.assert_allclose(np.asarray(traj2.lat), np.asarray(ref.lat),
                               rtol=0, atol=1e-12, equal_nan=True)

    # 3-D input with neither bg_dt nor a time variable must fail loudly
    np.savez(inp, u=np.swapaxes(frames, 1, 2), v=np.swapaxes(vframes, 1, 2),
             lat=np.degrees(lat), lon=np.degrees(lon))
    import pytest

    with pytest.raises(ValueError, match="bg_dt"):
        run(cfg2, RunPaths(inputuv=inp), verbose=False)


def test_run_regrid_gaussian_input(tmp_path, jet_field):
    """config.regrid=True lets the CLI ingest a Gaussian-latitude file that
    prepare() would refuse, matching a by-hand regrid_to_uniform run."""
    u, v, lat, lon = jet_field
    # resample the jet field onto a Gaussian-like (non-uniform) latitude axis
    nlat = lat.shape[0]
    glat = np.arcsin(np.polynomial.legendre.leggauss(nlat)[0])
    ug = np.stack([np.interp(glat, lat, u[i]) for i in range(u.shape[0])])
    vg = np.stack([np.interp(glat, lat, v[i]) for i in range(v.shape[0])])
    inp = str(tmp_path / "gauss.npz")
    np.savez(inp, u=ug.T, v=vg.T, lat=np.degrees(glat), lon=np.degrees(lon))

    cfg = RunConfig(zwn=(3.0,), sw_lon=10.0, sw_lat=20.0, dlon=1.0, dlat=1.0,
                    nnx=1, nny=1, tstep=2 * HOUR, ttotal=1 * DAY,
                    integrator="rk4", cal_dtype="float64")
    import pytest

    with pytest.raises(ValueError, match="regrid_to_uniform"):
        run(cfg, RunPaths(inputuv=inp), verbose=False)

    import dataclasses

    traj = run(dataclasses.replace(cfg, regrid=True),
               RunPaths(inputuv=inp), verbose=False)

    u32, v32 = ug.T.astype(np.float32), vg.T.astype(np.float32)
    ur, vr, latr, lonr = rt.regrid_to_uniform(u32.T, v32.T, glat, lon)
    bs = rt.prepare(ur.astype(np.float32), vr.astype(np.float32), latr, lonr,
                    cal_dtype="float64")
    ref = rt.trace_rays(bs, cfg)
    np.testing.assert_allclose(np.asarray(traj.lat), np.asarray(ref.lat),
                               rtol=0, atol=1e-12, equal_nan=True)


def test_member_path_edge_cases():
    from rwrt_tpu.main import _member_path

    assert _member_path("/tmp/run.dir/rays", 2) == "/tmp/run.dir/rays_m002"
    assert _member_path("/tmp/run.dir/rays.npz", 0) == "/tmp/run.dir/rays_m000.npz"
    assert _member_path("rays_{member}.npz", 3) == "rays_3.npz"
    assert _member_path(None, 1) is None


def test_run_with_shsf_ingest_smoothing(tmp_path, jet_field):
    """shsf_truncation in the config smooths (u, v) at ingest — the
    reference's offline SHSF preprocessing step (SHSF.py, manual sec. 7) —
    and matches applying diagnostics.spectral.shsf by hand."""
    from rwrt_tpu.diagnostics.spectral import shsf

    u, v, lat, lon = jet_field
    # add rough small-scale noise the filter should remove
    rng = np.random.default_rng(7)
    u = u + 0.5 * rng.standard_normal(u.shape)
    inp = str(tmp_path / "wind.npz")
    np.savez(inp, u=u.T, v=v.T, lat=np.degrees(lat), lon=np.degrees(lon))
    cfg = RunConfig(
        zwn=(3.0,), sw_lon=10.0, sw_lat=20.0, dlon=1.0, dlat=1.0,
        nnx=1, nny=1, tstep=2 * HOUR, ttotal=1 * DAY,
        integrator="rk4", cal_dtype="float64", shsf_truncation=8,
    )
    traj = run(cfg, RunPaths(inputuv=inp), verbose=False)

    u32 = u.astype(np.float32).astype(np.float64)
    v32 = v.astype(np.float32).astype(np.float64)
    us = np.asarray(shsf(u32.astype(np.float32), lat, 8))
    vs = np.asarray(shsf(v32.astype(np.float32), lat, 8))
    bs = rt.prepare(us, vs, lat, lon, cal_dtype="float64")
    ref = rt.trace_rays(bs, cfg)
    np.testing.assert_allclose(np.asarray(traj.lat), np.asarray(ref.lat),
                               rtol=0, atol=1e-12, equal_nan=True)
    # and the smoothing actually changed the run vs unfiltered input
    import dataclasses

    raw = run(dataclasses.replace(cfg, shsf_truncation=None),
              RunPaths(inputuv=inp), verbose=False)
    a, b = np.asarray(traj.lat), np.asarray(raw.lat)
    both = np.isfinite(a) & np.isfinite(b)
    assert not np.allclose(a[both], b[both])


def test_run_ensemble_from_file_list(tmp_path, jet_field):
    """A list-valued inputuv runs the ensemble sweep (BASELINE config 5)
    with per-member output files, equal to per-member single runs."""
    u, v, lat, lon = jet_field
    inputs = []
    for i in range(2):
        p = str(tmp_path / f"wind_{i}.npz")
        np.savez(p, u=(u * (1.0 + 0.2 * i)).T, v=v.T,
                 lat=np.degrees(lat), lon=np.degrees(lon))
        inputs.append(p)
    cfg = RunConfig(
        zwn=(3.0,), sw_lon=10.0, sw_lat=20.0, dlon=1.0, dlat=1.0,
        nnx=2, nny=1, tstep=2 * HOUR, ttotal=1 * DAY,
        integrator="rk45", cal_dtype="float64",
    )
    paths = RunPaths(inputuv=inputs, ncfile=str(tmp_path / "rays.npz"))
    trajs = run(cfg, paths, verbose=False)
    assert len(trajs) == 2
    for i in range(2):
        out = ncio.load_trajectories(str(tmp_path / f"rays_m{i:03d}.npz"))
        single = run(cfg, RunPaths(inputuv=inputs[i]), verbose=False)
        np.testing.assert_allclose(
            out["rlat"], np.degrees(np.asarray(single.lat)),
            rtol=0, atol=1e-9, equal_nan=True)

    # chunked ensemble: sequential per-member chunked runs, same results
    chunked_trajs = run(cfg, RunPaths(inputuv=inputs), verbose=False,
                        chunked=True)
    for a, b in zip(chunked_trajs, trajs):
        np.testing.assert_allclose(np.asarray(a.lat), np.asarray(b.lat),
                                   rtol=0, atol=1e-12, equal_nan=True)
    # {member} placeholder form
    paths2 = RunPaths(inputuv=inputs,
                      ncfile=str(tmp_path / "rays_{member}.npz"))
    run(cfg, paths2, verbose=False)
    assert (tmp_path / "rays_0.npz").exists()
    assert (tmp_path / "rays_1.npz").exists()


def test_initial_state_injection(jet_field):
    """trace_rays(initial_state=...) overrides computed initials (reference
    debug hook load_init_from_precal_nc, wr.py:398-415)."""
    import jax.numpy as jnp

    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    cfg = RunConfig(zwn=(3.0,), sw_lon=10.0, sw_lat=20.0, dlon=1.0, dlat=1.0,
                    nnx=1, nny=1, tstep=2 * HOUR, ttotal=1 * DAY,
                    integrator="rk4", cal_dtype="float64")
    base = rt.trace_rays(bs, cfg)
    y0 = jnp.asarray(np.stack([
        np.asarray(base.lon[0]).reshape(-1),
        np.asarray(base.lat[0]).reshape(-1) + 0.05,  # shift initial lat
        np.asarray(base.kx[0]).reshape(-1),
        np.asarray(base.ky[0]).reshape(-1),
        np.asarray(base.amp[0]).reshape(-1),
    ]))
    shifted = rt.trace_rays(bs, cfg, initial_state=y0)
    np.testing.assert_allclose(
        np.asarray(shifted.lat[0]).reshape(-1),
        np.asarray(base.lat[0]).reshape(-1) + 0.05,
    )
    la, lb = np.asarray(base.lat[-1]), np.asarray(shifted.lat[-1])
    both = np.isfinite(la) & np.isfinite(lb)
    assert not np.allclose(la[both], lb[both])


def test_load_basic_state_roundtrip(tmp_path, jet_field):
    """Stage-level restart: write basic state, reload, identical rays
    (reference read_from_precaled_nc, bs.py:409-454)."""
    u, v, lat, lon = jet_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    path = str(tmp_path / "bs.npz")
    ncio.write_basic_state(bs, path)
    bs2 = ncio.load_basic_state(path, cal_dtype="float64")
    cfg = RunConfig(zwn=(2.0, 4.0), sw_lon=0.0, sw_lat=15.0, dlon=120.0,
                    dlat=10.0, nnx=2, nny=2, tstep=2 * HOUR, ttotal=2 * DAY,
                    integrator="rk4", cal_dtype="float64")
    a = rt.trace_rays(bs, cfg)
    b = rt.trace_rays(bs2, cfg)
    np.testing.assert_allclose(np.asarray(a.lat), np.asarray(b.lat),
                               rtol=0, atol=1e-12, equal_nan=True)


def test_cli_end_to_end(tmp_path, jet_field):
    """python -m rwrt_tpu --config run.json (C20 CLI entry)."""
    import json

    from rwrt_tpu.__main__ import main as cli_main

    u, v, lat, lon = jet_field
    inp = str(tmp_path / "wind.npz")
    np.savez(inp, u=u.T, v=v.T, lat=np.degrees(lat), lon=np.degrees(lon))
    cfg = {
        "inputuv": inp,
        "ncfile": str(tmp_path / "rays.npz"),
        "zwn": [3.0],
        "sw_lon": 10.0, "sw_lat": 20.0, "dlon": 1.0, "dlat": 1.0,
        "nnx": 1, "nny": 1,
        "tstep": 7200.0, "ttotal": 86400.0,
        "integrator": "rk4", "cal_dtype": "float64",
    }
    cfg_path = str(tmp_path / "run.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    assert cli_main(["--config", cfg_path]) == 0
    out = ncio.load_trajectories(str(tmp_path / "rays.npz"))
    assert out["rlon"].shape[0] == 13

    # --wnmaps: the standalone grid-wide wavenumber product.
    wn_path = str(tmp_path / "wn.npz")
    assert cli_main(["--config", cfg_path, "--wnmaps", wn_path]) == 0
    with np.load(wn_path) as ds:
        assert ds["mwn"].shape == (u.shape[0], u.shape[1], 1, 3)
        assert "KS" in ds.files


def test_cli_run_report(tmp_path, jet_field):
    """--report writes a machine-readable JSON run report: config echo,
    backend, phase wall-clock, and per-ray termination accounting."""
    import json

    from rwrt_tpu.__main__ import main as cli_main

    u, v, lat, lon = jet_field
    inp = str(tmp_path / "wind.npz")
    np.savez(inp, u=u.T, v=v.T, lat=np.degrees(lat), lon=np.degrees(lon))
    cfg = {
        "inputuv": inp,
        "zwn": [2.0, 3.0],
        "sw_lon": 10.0, "sw_lat": 15.0, "dlon": 5.0, "dlat": 5.0,
        "nnx": 2, "nny": 2,
        "tstep": 7200.0, "ttotal": 86400.0,
        "integrator": "rk4", "cal_dtype": "float64",
    }
    cfg_path = str(tmp_path / "run.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    rep_path = str(tmp_path / "report.json")
    assert cli_main(["--config", cfg_path, "--report", rep_path]) == 0
    with open(rep_path) as f:
        rep = json.load(f)
    assert rep["framework"] == "rwrt_tpu"
    assert rep["config"]["nnx"] == 2
    assert rep["grid"] == {"nlon": u.shape[0], "nlat": u.shape[1],
                           "time_varying": False}
    tsum = rep["trajectories"]
    assert tsum["nt"] == 13
    assert tsum["n_rays"] == 3 * 4 * 2
    counts = tsum["termination"]
    assert sum(counts.values()) == tsum["n_rays"]
    assert rep["wall_s"]["total"] >= rep["wall_s"]["trace"] > 0

    # --report-exact: death causes from termination.classify. A tiny
    # cut_off kills every born ray at its first output step by the
    # haversine jump mask, and the exact re-run must label them 'jump'.
    cfg_kill = dict(cfg, cut_off=1e-9)
    with open(cfg_path, "w") as f:
        json.dump(cfg_kill, f)
    repk_path = str(tmp_path / "report_kill.json")
    assert cli_main(["--config", cfg_path, "--report", repk_path,
                     "--report-exact"]) == 0
    with open(repk_path) as f:
        repk = json.load(f)
    tsk = repk["trajectories"]
    assert tsk["termination_causes"] == "exact"
    born = tsk["n_rays"] - tsk["termination"]["no_root"]
    assert born > 0
    assert tsk["termination"]["jump"] == born
    assert tsk["termination"]["survived"] == 0

    # Ensemble report: per-member termination summaries.
    cfg["inputuv"] = [inp, inp]
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    rep2_path = str(tmp_path / "report2.json")
    assert cli_main(["--config", cfg_path, "--report", rep2_path]) == 0
    with open(rep2_path) as f:
        rep2 = json.load(f)
    assert rep2["n_members"] == 2
    assert len(rep2["members"]) == 2
    assert rep2["members"][0]["termination"] == rep2["members"][1]["termination"]


def test_cli_rejects_unknown_and_missing_config_keys(tmp_path):
    """Typos in the JSON config fail with a clean argparse error naming the
    bad key (exit code 2), not a raw TypeError."""
    import json

    import pytest

    from rwrt_tpu.__main__ import main as cli_main

    cfg = {"inputuv": "x.npz", "zwn": [3.0], "no_such_knob": 1}
    p = str(tmp_path / "bad.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    with pytest.raises(SystemExit) as e:
        cli_main(["--config", p])
    assert e.value.code == 2

    del cfg["no_such_knob"], cfg["inputuv"]
    with open(p, "w") as f:
        json.dump(cfg, f)
    with pytest.raises(SystemExit) as e:
        cli_main(["--config", p])
    assert e.value.code == 2


def test_wnmaps_time_varying_through_cli_surface(tmp_path, jet_field):
    """--wnmaps on a 3-D input writes the frame-axis wavenumber product
    (one map set per background frame, time coordinates from bg_dt)."""
    u, v, lat, lon = jet_field
    frames = np.stack([u, u * 1.2])
    vframes = np.stack([v, v])
    inp = str(tmp_path / "wind3d.npz")
    np.savez(inp, u=np.swapaxes(frames, 1, 2), v=np.swapaxes(vframes, 1, 2),
             lat=np.degrees(lat), lon=np.degrees(lon))
    cfg = RunConfig(
        zwn=(3.0,), sw_lon=10.0, sw_lat=20.0, dlon=1.0, dlat=1.0,
        nnx=2, nny=1, tstep=2 * HOUR, ttotal=1 * DAY,
        integrator="rk45", cal_dtype="float64", bg_dt=1.0 * DAY,
    )
    wn_path = str(tmp_path / "wn3d.npz")
    paths = RunPaths(inputuv=inp, bsfile=None,
                     ncfile=str(tmp_path / "rays3d.npz"))
    run(cfg, paths, verbose=False, wnmaps_path=wn_path)
    with np.load(wn_path) as ds:
        assert ds["mwn"].shape == (2, u.shape[0], u.shape[1], 1, 3)
        assert ds["rootnum"].shape == (2, u.shape[0], u.shape[1], 1)
        assert ds["KS"].shape == (2, u.shape[0], u.shape[1])
        np.testing.assert_allclose(ds["time"], [0.0, DAY])


def test_load_wind_normalizes_negative_longitudes(tmp_path, jet_field):
    """A -180..180 input grid is rolled to the 0-based convention the device
    samplers index by (exact: the grid is periodic); trajectories equal the
    same field stored 0..360."""
    u, v, lat, lon = jet_field  # (nlon, nlat), lon 0-based ascending radians
    nlon = lon.shape[0]
    k = nlon // 2
    lon_neg = np.degrees(lon).copy()
    lon_neg[lon_neg >= 180.0] -= 360.0
    lon_neg = np.roll(lon_neg, k)          # ascending -180..180
    u_neg = np.roll(u, k, axis=0)
    v_neg = np.roll(v, k, axis=0)
    assert lon_neg[0] < 0.0 and np.all(np.diff(lon_neg) > 0)

    p_neg = str(tmp_path / "wneg.npz")
    p_pos = str(tmp_path / "wpos.npz")
    np.savez(p_neg, u=u_neg.T, v=v_neg.T, lat=np.degrees(lat), lon=lon_neg)
    np.savez(p_pos, u=u.T, v=v.T, lat=np.degrees(lat), lon=np.degrees(lon))

    got = ncio.load_wind(p_neg, "float64")
    ref = ncio.load_wind(p_pos, "float64")
    np.testing.assert_allclose(got[3], ref[3], atol=1e-12)  # lon 0-based
    np.testing.assert_allclose(got[0], ref[0], atol=0)
    np.testing.assert_allclose(got[1], ref[1], atol=0)

    cfg = RunConfig(zwn=(3.0,), sw_lon=10.0, sw_lat=20.0, dlon=1.0, dlat=1.0,
                    nnx=2, nny=1, tstep=7200.0, ttotal=2 * DAY,
                    integrator="rk45", cal_dtype="float64")
    ta = run(cfg, RunPaths(inputuv=p_neg, ncfile=None), verbose=False)
    tb = run(cfg, RunPaths(inputuv=p_pos, ncfile=None), verbose=False)
    np.testing.assert_array_equal(np.asarray(ta.lat), np.asarray(tb.lat))
    np.testing.assert_array_equal(np.asarray(ta.lon), np.asarray(tb.lon))
