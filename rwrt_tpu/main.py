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
from rwrt_tpu.models.basic_state import prepare
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
    u, v, lat, lon = ncio.load_wind(paths.inputuv, config.read_dtype)
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

        zwn = np.asarray(config.zwn_array())
        maps = compute_wavenumber_maps(bs, zwn, freq=config.freq)
        ncio.write_wavenumber_maps(maps, bs, zwn, wnmaps_path)
        if verbose:
            print(f"wrote wavenumber maps to {wnmaps_path}")
    return traj
