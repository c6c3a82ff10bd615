"""Multi-device tests on the virtual 8-device CPU mesh: sharded runs must be
numerically identical to single-device runs; chunked/checkpointed drivers must
be equivalent to the fused run."""

import os

import numpy as np
import jax
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig
from rwrt_tpu.parallel import sharding as sh
from rwrt_tpu.utils.checkpoint import trace_rays_chunked

HOUR, DAY = 3600.0, 86400.0

CFG = dict(
    zwn=(2.0, 4.0, 6.0), sw_lon=0.0, sw_lat=5.0, dlon=36.0, dlat=8.0,
    nnx=5, nny=4, tstep=2 * HOUR, ttotal=4 * DAY, cal_dtype="float64",
)


@pytest.fixture(scope="module")
def bs(jet_field):
    u, v, lat, lon = jet_field
    return rt.prepare(u, v, lat, lon, cal_dtype="float64")


def _assert_traj_equal(a, b, atol=1e-11):
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, k)), np.asarray(getattr(b, k)),
            rtol=0, atol=atol, equal_nan=True, err_msg=k,
        )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("integrator", ["rk4", "rk45"])
def test_sharded_equals_single_device(bs, integrator):
    cfg = RunConfig(integrator=integrator, **CFG)
    single = rt.trace_rays(bs, cfg)
    mesh = sh.make_mesh(8)
    sharded = rt.trace_rays(bs, cfg, mesh=mesh)
    # GSPMD partitioning changes fusion order, so the adaptive controller's
    # accept/reject arithmetic differs at the ulp level and accumulates a
    # little along trajectories; 1e-6 rad is still ~5 orders below the
    # physical acceptance gate.
    _assert_traj_equal(single, sharded, atol=1e-11 if integrator == "rk4" else 1e-6)


def test_ray_padding():
    import jax.numpy as jnp

    y = jnp.ones((5, 10))
    padded, r = sh.pad_rays(y, 8)
    assert padded.shape == (5, 16) and r == 10
    assert np.isnan(np.asarray(padded)[:, 10:]).all()


@pytest.mark.parametrize("integrator", ["rk4", "rk45"])
def test_chunked_equals_fused(bs, integrator):
    cfg = RunConfig(integrator=integrator, **CFG)
    fused = rt.trace_rays(bs, cfg)
    chunked = trace_rays_chunked(bs, cfg, chunk_steps=7, verbose=False)
    _assert_traj_equal(fused, chunked)


def test_checkpoint_resume(bs, tmp_path):
    cfg = RunConfig(integrator="rk45", **CFG)
    ckpt = str(tmp_path / "run.npz")

    full = trace_rays_chunked(bs, cfg, chunk_steps=10, verbose=False,
                              checkpoint_path=str(tmp_path / "full.npz"))

    # Simulate a crash: run a few chunks only by truncating nt via ttotal,
    # then resume the real config from the saved checkpoint.
    partial_cfg = RunConfig(**{**CFG, "ttotal": 2 * DAY, "integrator": "rk45"})
    trace_rays_chunked(bs, partial_cfg, chunk_steps=10, verbose=False,
                       checkpoint_path=ckpt)
    resumed = trace_rays_chunked(bs, cfg, chunk_steps=10, verbose=False,
                                 checkpoint_path=ckpt, resume=True)
    _assert_traj_equal(full, resumed)


def test_bucketed_scheduling_bitwise_equal(bs):
    """difficulty_buckets partitions lanes by predicted attempt count into
    separate while_loops; every device op is elementwise along the lane
    axis and slices are 8-aligned, so results must be bit-identical."""
    cfg = RunConfig(integrator="rk45", **CFG)
    plain = trace_rays_chunked(bs, cfg, chunk_steps=9, verbose=False)
    cfg_b = RunConfig(integrator="rk45", difficulty_buckets=4, **CFG)
    bucketed = trace_rays_chunked(bs, cfg_b, chunk_steps=9, verbose=False)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(plain, k)), np.asarray(getattr(bucketed, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k,
        )


@pytest.mark.parametrize("integrator", ["rk4", "rk45"])
def test_sorted_rays_bitwise_equal(bs, integrator):
    """sort_rays reorders lanes for gather locality; every device op is
    elementwise along the lane axis, so results must be bit-identical."""
    cfg = RunConfig(integrator=integrator, **CFG)
    plain = trace_rays_chunked(bs, cfg, chunk_steps=9, verbose=False)
    sorted_ = trace_rays_chunked(bs, cfg, chunk_steps=9, verbose=False,
                                 sort_rays=True)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(plain, k)), np.asarray(getattr(sorted_, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k,
        )
