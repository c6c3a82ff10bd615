"""Observability: run banner, progress reporting, profiling, step-rate stats.

The reference's observability is a text progress bar (reference wr.py:28-35)
plus a config banner (wr.py:260-279) and the RK45 nfev counters
(rkf45.py:200-213). Equivalents here:

- ``run_banner``: the configuration banner.
- ``Progress``: host-side progress bar for chunked drivers (a single fused
  jit has no step granularity to report; the chunked tracer in
  utils/checkpoint.py reports between chunks).
- ``profile``: context manager around jax.profiler for TPU traces.
- solver statistics (step attempts, RHS evaluations) are returned by the
  RK45 path itself (solvers/rk45.py carries iters/nfev counters).
"""

from __future__ import annotations

import contextlib
import sys
import time

from rwrt_tpu.config import RunConfig
from rwrt_tpu.constants import day


def run_banner(config: RunConfig, nlon: int, nlat: int, *, file=sys.stdout):
    """Print the run-configuration banner (reference ray_info, wr.py:260-279)."""
    w = file.write
    w("=" * 78 + "\n")
    w(" rwrt_tpu: Barotropic Horizontal Rossby Wave Ray Tracing\n")
    w(f" Basic flow grid (nlon x nlat): {nlon} x {nlat}\n")
    w(f" Initial zonal wavenumbers ({config.nzwn}): "
      + " ".join(f"{z:.1f}" for z in config.zwn) + "\n")
    w(f" Sources: {config.nsource} points, SW corner "
      f"({config.sw_lon:.2f}E, {config.sw_lat:.2f}N), "
      f"d(lon,lat)=({config.dlon:.2f}, {config.dlat:.2f}) deg, "
      f"{config.nnx} x {config.nny}\n")
    w(f" Time step (s): {config.tstep:.1f}\n")
    w(f" Total integration time (day): {config.ttotal / day:.1f}\n")
    w(f" Total output steps (nt): {config.nt}\n")
    w(f" Integrator: {config.integrator}  dtype: {config.cal_dtype}\n")
    w("=" * 78 + "\n")
    file.flush()


class Progress:
    """Progress bar + ray-step-rate reporter (reference wr.py:28-35 shape)."""

    def __init__(self, total: int, bar_length: int = 50, file=sys.stdout):
        self.total = total
        self.bar_length = bar_length
        self.file = file
        self.t0 = time.perf_counter()
        self.ray_steps = 0

    def update(self, current: int, ray_steps: int = 0, alive_frac=None):
        self.ray_steps += ray_steps
        frac = current / max(self.total, 1)
        n = int(round(frac * self.bar_length))
        arrow = "=" * max(n - 1, 0) + ">"
        spaces = " " * (self.bar_length - len(arrow))
        rate = self.ray_steps / max(time.perf_counter() - self.t0, 1e-9)
        extra = f" {rate:,.0f} ray-steps/s" if self.ray_steps else ""
        if alive_frac is not None:
            extra += f" alive {alive_frac:5.1%}"
        self.file.write(f"\rprogress: [{arrow}{spaces}] {frac:5.1%}{extra}")
        self.file.flush()
        if current >= self.total:
            self.file.write("\n")


@contextlib.contextmanager
def profile(logdir: str = "/tmp/rwrt_tpu_profile"):
    """Capture a jax.profiler trace (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
