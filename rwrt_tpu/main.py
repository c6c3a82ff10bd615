"""End-to-end run driver: the reference ``real2d_hnf`` equivalent.

Counterpart of reference main_wr.py:31-89: load the background wind, build
the basic state, write the basic-state diagnostics file, seed the source
matrix, run the ray integration, and write the trajectory file. Configuration
is a typed RunConfig (see config.py) instead of a loose dict.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from rwrt_tpu.config import RunConfig
from rwrt_tpu.io import ncio
from rwrt_tpu.models.basic_state import prepare, prepare_time_varying
from rwrt_tpu.tracer import RayTrajectories, trace_rays
from rwrt_tpu.utils.checkpoint import trace_rays_chunked
from rwrt_tpu.utils.observability import run_banner


@dataclasses.dataclass(frozen=True)
class RunPaths:
    """File paths (reference main_wr.py:23-25)."""

    inputuv: str              # background wind (nc or npz)
    bsfile: Optional[str] = None   # basic-state diagnostics output
    ncfile: Optional[str] = None   # trajectory output


def run(config: RunConfig, paths: RunPaths, *, mesh=None, verbose: bool = True,
        chunked: bool = False, checkpoint_path: Optional[str] = None,
        wnmaps_path: Optional[str] = None) -> RayTrajectories:
    """Execute the full pipeline (reference real2d_hnf, main_wr.py:31-89).

    mesh: a jax.sharding.Mesh, or True to build one over
    config.mesh_devices local devices (None = all).
    wnmaps_path: also write the grid-wide wavenumber diagnostics (the
    reference's standalone WN product, wn.py:21-135) there, reusing the
    basic state this run already prepared.
    """
    config.validate()
    if mesh is True:
        from rwrt_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(config.mesh_devices)
    u, v, lat, lon, times = ncio.load_wind(
        paths.inputuv, config.read_dtype, with_time=True)
    if u.ndim == 3:
        # Time-varying background (BASELINE.json config 4): frame cadence
        # from the config, else from the file's time variable (seconds).
        if config.bg_dt > 0:
            bg_t0, bg_dt = config.bg_t0, config.bg_dt
        else:
            if times is None or len(times) < 2:
                raise ValueError(
                    f"{paths.inputuv} holds {u.shape[0]} wind frames but no "
                    "usable time variable; set bg_dt (and optionally bg_t0) "
                    "in the config, in seconds"
                )
            import numpy as np

            steps = np.diff(times)
            if not np.allclose(steps, steps[0], rtol=1e-6):
                raise ValueError(
                    "input time variable is not uniformly spaced; "
                    "set bg_dt explicitly"
                )
            bg_t0, bg_dt = float(times[0]), float(steps[0])
        bs = prepare_time_varying(
            u, v, lat, lon, bg_t0=bg_t0, bg_dt=bg_dt, xcyclic=config.xcyclic,
            read_dtype=config.read_dtype, cal_dtype=config.cal_dtype,
        )
    else:
        bs = prepare(
            u, v, lat, lon, xcyclic=config.xcyclic,
            read_dtype=config.read_dtype, cal_dtype=config.cal_dtype,
        )
    if paths.bsfile:
        ncio.write_basic_state(bs, paths.bsfile)
    if verbose:
        run_banner(config, bs.nlon, bs.nlat)
    if chunked or checkpoint_path:
        traj = trace_rays_chunked(
            bs, config, checkpoint_path=checkpoint_path, verbose=verbose,
            mesh=mesh,
        )
    else:
        traj = trace_rays(bs, config, mesh=mesh)
    if paths.ncfile:
        ncio.write_trajectories(traj, paths.ncfile, config.zwn_array())
    if wnmaps_path:
        import numpy as np

        from rwrt_tpu.diagnostics import compute_wavenumber_maps

        if bs.fields.ndim == 4:
            raise ValueError(
                "wnmaps are a static-background diagnostic; compute them "
                "per frame via compute_wavenumber_maps on a single-frame "
                "prepare() instead of a time-varying run"
            )
        zwn = np.asarray(config.zwn_array())
        maps = compute_wavenumber_maps(bs, zwn, freq=config.freq)
        ncio.write_wavenumber_maps(maps, bs, zwn, wnmaps_path)
        if verbose:
            print(f"wrote wavenumber maps to {wnmaps_path}")
    return traj
