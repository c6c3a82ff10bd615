"""Exact-cause termination classification rate on a standard workload.

VERDICT r2 weak-point 5: ``diagnostics.termination.classify`` re-runs each
dead ray's killing interval, and on the ADAPTIVE path the re-run starts from
a fresh per-ray initial step size, so a death can in principle fail to
reproduce ('other'). This test pins the reconstruction fidelity on a
physically standard workload with a meaningful natural death population
(critical lines from tropical easterlies, reference kill semantics
wr.py:721-734 and 508-514): >=95% of adaptive-path deaths must get a real
label.
"""

import numpy as np
import pytest

import rwrt_tpu as rt
from rwrt_tpu.config import RunConfig
from rwrt_tpu.diagnostics.termination import classify

HOUR, DAY = 3600.0, 86400.0


@pytest.fixture(scope="module")
def critical_line_field():
    """Jets + tropical easterlies: rays launched in midlatitudes propagate
    equatorward into the u<0 belt where the step collapses at the critical
    line (runaway |m|) or the group velocity spikes (jump kills)."""
    nlon, nlat = 72, 37
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.arange(nlon) * 2 * np.pi / nlon
    u = (
        -28.0 * np.cos(lat)[None, :] ** 2 * np.cos(2 * lat)[None, :]
        + 30.0 * np.exp(-(((np.degrees(lat)[None, :] - 40.0) / 10.0) ** 2))
        + 25.0 * np.exp(-(((np.degrees(lat)[None, :] + 45.0) / 10.0) ** 2))
        + 6.0 * np.cos(3 * lon)[:, None] * np.cos(lat)[None, :] ** 2
    )
    v = 5.0 * np.sin(2 * lon)[:, None] * np.cos(lat)[None, :]
    return u, v, lat, lon


def test_classify_other_rate_adaptive(critical_line_field):
    u, v, lat, lon = critical_line_field
    bs = rt.prepare(u, v, lat, lon, cal_dtype="float64")
    cfg = RunConfig(
        zwn=(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0),
        sw_lon=0.0, sw_lat=-50.0, dlon=60.0, dlat=12.0, nnx=6, nny=8,
        tstep=2 * HOUR, ttotal=20 * DAY,
        integrator="rk45", cal_dtype="float64",
    )
    traj = rt.trace_rays(bs, cfg)
    rep = classify(traj, bs, cfg)
    died = sum(rep.counts[k] for k in ("polar", "jump", "runaway", "other"))
    # The workload must actually produce a meaningful death population, and
    # more than one distinct cause, or the rate gate is vacuous.
    assert died >= 30, rep.counts
    labeled = died - rep.counts["other"]
    n_causes = sum(rep.counts[k] > 0 for k in ("polar", "jump", "runaway"))
    assert n_causes >= 2, rep.counts
    assert labeled / died >= 0.95, (
        f"classify labeled only {labeled}/{died} adaptive-path deaths "
        f"({rep.counts})")
    # Accounting closes: every lane is exactly one of the buckets.
    assert sum(rep.counts.values()) == rep.death_step.size
