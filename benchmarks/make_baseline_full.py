"""Full-scale (north-star-shaped) reference CPU baseline measurement.

VERDICT r3 weak #7: `bench.py`'s vs_baseline ratio divides by
`benchmarks/baseline_cpu.json`, which was measured at 4,200 rays x 5 days
and extrapolated.  This script measures the reference's vectorized RK45
path (mode='numpy', inte_method='rk45', /root/reference/wr.py:767) at the
EXACT bench workload shape: the same 144x73 climatology background, the
same rng(0) random source seeding (bench.py seeds 4,800 uniform sources in
lon 0..2pi / lat +-65 deg and zwn 1..7 -> 100,800 rays), the same 2 h
output cadence and 30-day horizon, the same rtol/atol/MinStepFactor.

Notes on fairness:
  - numba is not installed in this environment, so the reference's numba
    kernels (core_diffun wr.py:44, cal_ugvg 'extent' wn.py:266) run as the
    equivalent pure-numpy array expressions through tests/refshim's
    identity-decorator stub.  The reference's hot loop is vectorized numpy
    either way; the stub removes only the scalar-kernel fusion.  The
    original 4,200-ray baseline was measured under the same conditions.
  - The reference carries rootless lanes (no dispersion root -> NaN) in
    its arrays exactly as bench.py's accounting assumes; no compaction is
    applied on either side of the ratio.
  - Run this alone on the host (single vCPU): concurrent CPU work inflates
    the wall and would overstate the TPU speedup.  When in doubt run twice
    and keep the FASTER run (conservative for vs_baseline).

Usage: python benchmarks/make_baseline_full.py
         [BASE_DAYS=30] [BASE_NSOURCE=4800] [BASE_OUT=baseline_cpu_full.json]
Writes benchmarks/<BASE_OUT> and prints the JSON.
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tests"))
sys.path.insert(0, os.path.dirname(_HERE))

from bench import climatology_background  # noqa: E402
from refshim import load_reference  # noqa: E402


def main():
    _, _, wr_mod = load_reference()
    hour, day = 3600.0, 86400.0
    tstep = 2 * hour
    days = float(os.environ.get("BASE_DAYS", "30"))
    ttotal = days * day
    nzwn = 7
    nsource = int(os.environ.get("BASE_NSOURCE", "4800"))

    u, v, lat, lon = climatology_background()
    w = wr_mod.WR(nzwn, nsource, tstep, ttotal, 0.0,
                  nx=u.shape[0], ny=u.shape[1], rtol=1e-6, atol=1e-6,
                  MinStepFactor=1e-3)
    w.bs.u = u.astype("float32")
    w.bs.v = v.astype("float32")
    w.bs.lat = lat.astype("float64")
    w.bs.lon = lon.astype("float64")
    w.bs.ready(xcyclic=True)
    w.set_zwn(list(range(1, nzwn + 1)))

    # Identical seeding to bench.py (rng(0), float32 cast) so the two sides
    # of the vs_baseline ratio integrate the same rays.
    rng = np.random.default_rng(0)
    slon = rng.uniform(0, 2 * np.pi, nsource).astype("float32")
    slat = rng.uniform(np.radians(-65), np.radians(65), nsource).astype(
        "float32")
    w.set_source_array(np.degrees(slon.astype("float64")),
                       np.degrees(slat.astype("float64")))

    n_rays = 3 * nsource * nzwn

    # Count ray-lane step attempts exactly by intercepting the solver's
    # rk_step (one call covers the currently-pending lane subset).
    import rkf45

    lane_attempts = [0]
    orig_rk_step = rkf45.rk_step

    def counting_rk_step(fun, t, y, f, h, A, B, C, K):
        lane_attempts[0] += y.shape[-1]
        return orig_rk_step(fun, t, y, f, h, A, B, C, K)

    rkf45.rk_step = counting_rk_step
    try:
        t0 = time.perf_counter()
        w.ray_run(mode="numpy", root_method="numpy", inte_method="rk45")
        wall = time.perf_counter() - t0
    finally:
        rkf45.rk_step = orig_rk_step

    nt = int(ttotal / tstep) + 1
    out = {
        "output_ray_steps_per_sec": n_rays * (nt - 1) / wall,
        "ray_steps_per_sec": lane_attempts[0] / wall,
        "wall_s": wall,
        "n_rays": n_rays,
        "days": days,
        "lane_attempts": lane_attempts[0],
        "note": (
            "reference vectorized RK45 (numpy dialect) on CPU at the FULL "
            "north-star workload shape (same background, same rng(0) "
            "seeding, same tolerances as bench.py); numba stubbed to pure "
            "numpy (not installed here; see module docstring); "
            "output_ray_steps = ray lanes x output intervals (work "
            "delivered); ray_steps = per-lane 7-stage step attempts "
            "counted via rk_step interception"
        ),
    }
    path = os.path.join(_HERE, os.environ.get("BASE_OUT",
                                              "baseline_cpu_full.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
