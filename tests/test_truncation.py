"""max_iters truncation surfacing (VERDICT r4 weak #4 / item 7).

The adaptive runners' while_loops carry a max_iters backstop (a runaway
guard ~4 orders of magnitude above any healthy chunk's trip count). A run
that hits it used to return quietly with the cut lanes' histories frozen
mid-interval -- finite rows that stop evolving, indistinguishable from
valid data downstream. Contract now:

- the fused grouped/interval runners return a truncation count (lanes cut
  short of their final bound; dead lanes jump their t to the bound and
  never count);
- trace_rays / trace_rays_ensemble raise MaxItersTruncation instead of
  returning silently-frozen lanes;
- the chunked driver keeps its per-chunk reporting (tests/test_chunk_budget
  covers it);
- healthy runs report zero (implicitly gated by every other test not
  raising).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig
from rwrt_tpu import tracer

HOUR = 3600.0

CFG = dict(
    zwn=(2.0, 4.0), sw_lon=0.0, sw_lat=0.0, dlon=30.0, dlat=10.0,
    nnx=4, nny=3, tstep=2 * HOUR, ttotal=2 * HOUR * 24,
    cal_dtype="float64", integrator="rk45",
)


@pytest.fixture(scope="module")
def bs():
    lat = np.linspace(-np.pi / 2, np.pi / 2, 33)
    lon = np.arange(64) * 2 * np.pi / 64
    u = (20.0 * np.cos(lat)[None, :] ** 2
         + 5.0 * np.cos(2 * lon)[:, None] * np.cos(lat)[None, :])
    v = 2.0 * np.sin(lon)[:, None] * np.cos(lat)[None, :]
    return rt.prepare(u, v, lat, lon, cal_dtype="float64")


def _init(bs, cfg):
    dtype = bs.fields.dtype
    bg = tracer.make_background(bs, cfg.freq)
    slon, slat = tracer.source_matrix(cfg.sw_lon, cfg.sw_lat, cfg.dlon,
                                      cfg.dlat, cfg.nnx, cfg.nny)
    y0, ug0, vg0 = tracer.initialize(
        bg, jnp.asarray(slon, dtype), jnp.asarray(slat, dtype),
        jnp.asarray(cfg.zwn_array(), dtype))
    return bg, y0, ug0, vg0


@pytest.mark.parametrize("dense", [True, False])
def test_grouped_runner_reports_truncation(bs, dense):
    cfg = RunConfig(bound_mode="dense" if dense else "exact", **CFG)
    bg, y0, ug0, vg0 = _init(bs, cfg)
    dt = jnp.asarray(cfg.tstep, y0.dtype)
    args = (bg, y0, ug0, vg0, dt, cfg.nt, jnp.asarray(cfg.cut_off_rad),
            jnp.asarray(cfg.rtol), jnp.asarray(cfg.atol),
            jnp.asarray(cfg.min_step_factor * cfg.tstep))
    # Healthy: default backstop, zero truncation.
    out = tracer._run_rk45_grouped(*args, group=8, dense=dense)
    assert int(out[5]) == 0
    # Strangled: a 2-trip budget cannot finish 8-bound groups.
    out = tracer._run_rk45_grouped(*args, group=8, dense=dense, max_iters=2)
    assert int(out[5]) > 0
    with pytest.raises(tracer.MaxItersTruncation, match="max_iters"):
        tracer._check_truncation(out[5])


def test_trace_rays_raises_on_truncation(bs, monkeypatch):
    cfg = RunConfig(bound_mode="dense", **CFG)
    orig = tracer._run_rk45_grouped

    def strangled(*a, **k):
        k["max_iters"] = 2
        return orig(*a, **k)

    monkeypatch.setattr(tracer, "_run_rk45_grouped", strangled)
    with pytest.raises(tracer.MaxItersTruncation, match="unfinished"):
        tracer.trace_rays(bs, cfg)


def test_trace_rays_healthy_does_not_raise(bs):
    traj = tracer.trace_rays(bs, RunConfig(bound_mode="dense", **CFG))
    assert np.asarray(traj.lon).shape[0] == 25
