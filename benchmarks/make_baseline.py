"""Generate the reference CPU baseline for bench.py's vs_baseline ratio.

The reference publishes no benchmark numbers (BASELINE.md), so this script
measures them: it runs the reference implementation's vectorized RK45 path
(mode='numpy', inte_method='rk45') on the same climatology-shaped background
as bench.py, on a reduced ray count (the reference is single-process CPU
numpy; full 100k x 30d would take hours), and records ray-steps/sec where one
ray-step is one 7-stage RK45 step attempt for one ray lane (nfev / 7 attempts
-- matching bench.py's accounting).

Usage: PYTHONPATH=tests python benchmarks/make_baseline.py
Writes benchmarks/baseline_cpu.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import climatology_background  # noqa: E402
from refshim import load_reference  # noqa: E402


def main():
    _, _, wr_mod = load_reference()
    hour, day = 3600.0, 86400.0
    tstep = 2 * hour
    days = float(os.environ.get("BASE_DAYS", "5"))
    ttotal = days * day
    nzwn = 7
    nnx, nny = int(os.environ.get("BASE_NNX", "10")), 5
    nsource = nnx * nny

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
    w.set_source_matrix(0.0, -40.0, 360.0 / nnx, 16.0, nnx, nny)

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
            "reference vectorized RK45 (numpy dialect) on CPU; "
            "output_ray_steps = ray lanes x output intervals (work "
            "delivered); ray_steps = per-lane 7-stage step attempts counted "
            "via rk_step interception"
        ),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baseline_cpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
