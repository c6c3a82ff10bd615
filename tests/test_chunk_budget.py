"""trace_rays_chunked(max_chunks=...) cooperative chunk budget.

The 90-day streamed probe (benchmarks/stream90_probe.py) chains process
attempts through this: each invocation advances max_chunks chunks, raises
ChunkBudgetReached after checkpointing, and the next invocation resumes.
The chained result must equal the uninterrupted run bitwise (the
checkpoint carry is the production resume path, already golden-tested;
this gates the budget exit specifically).
"""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig
from rwrt_tpu.utils import checkpoint as ckpt

HOUR, DAY = 3600.0, 86400.0

CFG = dict(
    zwn=(2.0, 4.0, 6.0), sw_lon=0.0, sw_lat=5.0, dlon=36.0, dlat=8.0,
    nnx=5, nny=4, tstep=2 * HOUR, ttotal=4 * DAY, cal_dtype="float64",
    integrator="rk45", bound_mode="dense",
)


@pytest.fixture(scope="module")
def bs(jet_field):
    u, v, lat, lon = jet_field
    return rt.prepare(u, v, lat, lon, cal_dtype="float64")


def test_budget_chain_equals_uninterrupted(bs, tmp_path):
    cfg = RunConfig(**CFG)
    full = ckpt.trace_rays_chunked(bs, cfg, chunk_steps=8, verbose=False)

    ck = str(tmp_path / "ck.npz")
    chained = None
    for attempt in range(40):
        try:
            chained = ckpt.trace_rays_chunked(
                bs, cfg, chunk_steps=8, checkpoint_path=ck, verbose=False,
                max_chunks=1)
            break
        except ckpt.ChunkBudgetReached as e:
            assert 0 < e.step < e.nt
    assert chained is not None, "never completed"
    assert attempt >= 2, "budget never fired; test is vacuous"
    for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg"):
        np.testing.assert_allclose(
            np.asarray(getattr(full, k)), np.asarray(getattr(chained, k)),
            rtol=0, atol=0, equal_nan=True, err_msg=k,
        )


def test_budget_requires_checkpoint(bs):
    cfg = RunConfig(**CFG)
    with pytest.raises(ValueError, match="checkpoint_path"):
        ckpt.trace_rays_chunked(bs, cfg, chunk_steps=8, verbose=False,
                                max_chunks=1)
