"""Per-ray termination accounting.

The reference's failure handling is per-ray masks (SURVEY.md section 5:
latitude out of range wr.py:508, runaway |m| wr.py:509, excessive haversine
displacement wr.py:728-734, polar cap bs.py:858-860) with NaN-fill of dead
rays -- but it records nothing about WHEN or WHY rays died. This module
reconstructs that observability from trajectories.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np

from rwrt_tpu.tracer import RayTrajectories


class TerminationReport(NamedTuple):
    """death_step: (3, nsource, nzwn) int; -1 = never born (no root),
    nt = survived to the end. cause maps step-of-death to a labeled reason
    where reconstructable."""

    death_step: np.ndarray
    alive_frac: np.ndarray   # (nt,) fraction of born rays alive per step
    counts: Dict[str, int]


def analyze(traj: RayTrajectories, cut_off: float | None = None) -> TerminationReport:
    lon = np.asarray(traj.lon)
    lat = np.asarray(traj.lat)
    nt = lon.shape[0]
    finite = np.isfinite(lon)

    born = finite[0]
    # First index where the ray is NaN; rays alive throughout get nt.
    dead_any = ~finite
    first_dead = np.where(
        dead_any.any(axis=0), dead_any.argmax(axis=0), nt
    )
    death_step = np.where(born, first_dead, -1)

    n_born = max(int(born.sum()), 1)
    alive_frac = finite.sum(axis=(1, 2, 3)) / n_born

    # Reconstruct causes at the step of death from the last live state.
    counts = {"no_root": int((~born).sum()), "survived": 0,
              "polar": 0, "jump": 0, "other": 0}
    idx = np.argwhere((death_step >= 1) & (death_step < nt))
    for r, s, z in idx:
        d = death_step[r, s, z]
        la_prev = lat[d - 1, r, s, z]
        lo_prev = lon[d - 1, r, s, z]
        # neighbors at death step unknown (NaN); classify from the last live
        # latitude: near-polar death vs displacement/other.
        if np.isfinite(la_prev) and abs(la_prev) > np.radians(80.0):
            counts["polar"] += 1
        elif cut_off is not None and np.isfinite(lo_prev):
            counts["jump"] += 1
        else:
            counts["other"] += 1
    counts["survived"] = int((death_step == nt).sum())
    return TerminationReport(
        death_step=death_step, alive_frac=alive_frac, counts=counts
    )
