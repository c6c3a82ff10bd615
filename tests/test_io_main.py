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
