"""Mid-run dead-lane compaction (RunConfig.compact_dead).

A lane whose emitted position has gone NaN emits NaN at every remaining
output bound (reference terminate_ray semantics, bs.py:456-459), so dropping
it from the device batch at a chunk boundary must be EXACT: bitwise-equal
histories to the uncompacted chunked run, across checkpoint/resume, under a
device mesh, and in both bound modes. The tight cut_off below kills most
born rays within days so the power-of-two width ladder actually engages
(asserted via the driver's verbose compaction message).
"""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig
from rwrt_tpu.parallel import sharding as sh
from rwrt_tpu.utils.checkpoint import trace_rays_chunked

HOUR, DAY = 3600.0, 86400.0

# cut_off=0.01 (rad per tstep-hour) kills ~90% of the 126 born lanes within
# 6 model days on the jet field; the 54 rootless lanes are compacted off at
# init (compact_rootless), so the device batch thins 126 -> ~12 alive.
CFG = dict(
    zwn=(2.0, 4.0, 6.0), sw_lon=0.0, sw_lat=5.0, dlon=36.0, dlat=8.0,
    nnx=5, nny=4, tstep=2 * HOUR, ttotal=6 * DAY, cal_dtype="float64",
    cut_off=0.01,
)


@pytest.fixture(scope="module")
def bs(jet_field):
    u, v, lat, lon = jet_field
    return rt.prepare(u, v, lat, lon, cal_dtype="float64")


def _assert_bitwise(a, b):
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, k)), np.asarray(getattr(b, k)), err_msg=k,
        )


def _run(bs, cfg, compact, capsys=None, **kw):
    verbose = capsys is not None
    traj = trace_rays_chunked(
        bs, cfg.validate() if compact else
        RunConfig(**{**cfg.__dict__, "compact_dead": False}),
        chunk_steps=12, verbose=verbose, compact_min_width=16, **kw,
    )
    if capsys is not None:
        out = capsys.readouterr().out
        assert "compacted device batch" in out, (
            "compaction never engaged; the test scenario is vacuous"
        )
    return traj


@pytest.mark.parametrize("integrator", ["rk4", "rk45"])
def test_compacted_bitwise_equals_uncompacted(bs, integrator, capsys):
    cfg = RunConfig(integrator=integrator, **CFG)
    plain = _run(bs, cfg, compact=False)
    compacted = _run(bs, cfg, compact=True, capsys=capsys)
    _assert_bitwise(plain, compacted)


def test_compacted_dense_mode(bs, capsys):
    cfg = RunConfig(integrator="rk45", bound_mode="dense", **CFG)
    plain = _run(bs, cfg, compact=False)
    compacted = _run(bs, cfg, compact=True, capsys=capsys)
    _assert_bitwise(plain, compacted)


def test_checkpoint_resume_across_compaction(bs, tmp_path, capsys):
    """Resume from a checkpoint written AFTER the batch compacted: the
    stored lane subset is adopted and the result is bitwise-identical to
    the uninterrupted compacted run (and to the uncompacted one)."""
    cfg = RunConfig(integrator="rk45", **CFG)
    full = _run(bs, cfg, compact=True, capsys=capsys)

    ckpt = str(tmp_path / "run.npz")
    partial_cfg = RunConfig(**{**CFG, "ttotal": 4 * DAY, "integrator": "rk45"})
    trace_rays_chunked(bs, partial_cfg, chunk_steps=12, verbose=False,
                       compact_min_width=16, checkpoint_path=ckpt)
    # The 4-day checkpoint must already hold a compacted lane subset for
    # this resume to exercise subset adoption.
    with np.load(ckpt) as ds:
        assert ds["lanes"].shape[0] < 126
    resumed = trace_rays_chunked(bs, cfg, chunk_steps=12, verbose=False,
                                 compact_min_width=16, checkpoint_path=ckpt)
    _assert_bitwise(full, resumed)

    plain = _run(bs, cfg, compact=False)
    _assert_bitwise(plain, resumed)


def test_compacted_under_mesh(bs, capsys):
    """Compaction keeps the width a multiple of the mesh size; results match
    the single-device compacted run at the established shardmap tolerance
    (per-shard codegen ULP wobble, tests/test_parallel.py)."""
    cfg = RunConfig(integrator="rk45", **CFG)
    single = _run(bs, cfg, compact=True)
    mesh = sh.make_mesh(8)
    sharded = _run(bs, cfg, compact=True, capsys=capsys, mesh=mesh)
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(single, k)), np.asarray(getattr(sharded, k)),
            rtol=0, atol=1e-6, equal_nan=True, err_msg=k,
        )


def test_rootless_lanes_survive_compaction(bs):
    """Never-born lanes keep finite frozen positions; with compact_rootless
    OFF they stay on device and must never be dropped by dead-lane
    compaction (their emissions are finite, not NaN)."""
    cfg = RunConfig(integrator="rk45",
                    **{**CFG, "compact_rootless": False})
    plain = trace_rays_chunked(
        bs, RunConfig(**{**cfg.__dict__, "compact_dead": False}),
        chunk_steps=12, verbose=False)
    compacted = trace_rays_chunked(bs, cfg, chunk_steps=12, verbose=False,
                                   compact_min_width=16)
    _assert_bitwise(plain, compacted)


def test_checkpoint_from_different_source_config_rejected(bs, tmp_path):
    """A lane-map checkpoint records the run's total ray count: a checkpoint
    written under a SMALLER source configuration passes the subset check by
    accident (its lane ids all exist here but name different rays), so the
    count must be compared, not the id set."""
    ck = str(tmp_path / "ck.npz")
    small = RunConfig(integrator="rk45", **{**CFG, "nny": 2})
    trace_rays_chunked(bs, small, chunk_steps=12, verbose=False,
                       checkpoint_path=ck)
    big = RunConfig(integrator="rk45", **CFG)
    with pytest.raises(ValueError, match="source configuration differs"):
        trace_rays_chunked(bs, big, chunk_steps=12, verbose=False,
                           checkpoint_path=ck)
