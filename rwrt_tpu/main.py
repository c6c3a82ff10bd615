"""End-to-end run driver: the reference ``real2d_hnf`` equivalent.

Counterpart of reference main_wr.py:31-89: load the background wind, build
the basic state, write the basic-state diagnostics file, seed the source
matrix, run the ray integration, and write the trajectory file. Configuration
is a typed RunConfig (see config.py) instead of a loose dict.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import numpy as np

from rwrt_tpu.config import RunConfig
from rwrt_tpu.io import ncio
from rwrt_tpu.models.basic_state import (
    prepare,
    prepare_time_varying,
    regrid_to_uniform,
)
from rwrt_tpu.tracer import RayTrajectories, trace_rays
from rwrt_tpu.utils.checkpoint import trace_rays_chunked
from rwrt_tpu.utils.observability import run_banner


@dataclasses.dataclass(frozen=True)
class RunPaths:
    """File paths (reference main_wr.py:23-25).

    inputuv may be a list of wind files: that selects an ensemble sweep
    (one member per file; BASELINE.json config 5). Per-member output paths
    are derived from bsfile/ncfile via a ``{member}`` placeholder, or an
    ``_m{i:03d}`` suffix before the extension when no placeholder is given.
    """

    inputuv: str              # background wind (nc or npz), or list of them
    bsfile: Optional[str] = None   # basic-state diagnostics output
    ncfile: Optional[str] = None   # trajectory output


def _load_and_prepare(inputuv: str, config: RunConfig):
    """Load one wind file and build its (static or time-varying) BasicState."""
    u, v, lat, lon, times = ncio.load_wind(
        inputuv, config.read_dtype, with_time=True)
    if config.regrid:
        # Ingest-time regrid for Gaussian/regional source grids that
        # `prepare` refuses (reference scalar-path searchsorted semantics).
        if u.ndim == 3:
            frames = [regrid_to_uniform(u[i], v[i], lat, lon)
                      for i in range(u.shape[0])]
            u = np.stack([f[0] for f in frames]).astype(u.dtype)
            v = np.stack([f[1] for f in frames]).astype(v.dtype)
            lat, lon = frames[0][2], frames[0][3]
        else:
            dtype = u.dtype
            u, v, lat, lon = regrid_to_uniform(u, v, lat, lon)
            u = u.astype(dtype)
            v = v.astype(dtype)
    if config.shsf_truncation is not None:
        # Ingest-time spherical-harmonic smoothing (the reference's offline
        # SHSF preprocessing, SHSF.py:10-33 / manual section 7). shsf maps
        # over a leading stack axis, so time frames pass straight through.
        from rwrt_tpu.diagnostics.spectral import shsf

        u = np.asarray(shsf(u, lat, config.shsf_truncation,
                            config.shsf_mode), u.dtype)
        v = np.asarray(shsf(v, lat, config.shsf_truncation,
                            config.shsf_mode), v.dtype)
    if u.ndim == 3:
        # Time-varying background (BASELINE.json config 4): frame cadence
        # from the config, else from the file's time variable (seconds).
        if config.bg_dt > 0:
            bg_t0, bg_dt = config.bg_t0, config.bg_dt
        else:
            if times is None or len(times) < 2:
                raise ValueError(
                    f"{inputuv} holds {u.shape[0]} wind frames but no "
                    "usable time variable; set bg_dt (and optionally bg_t0) "
                    "in the config, in seconds"
                )
            steps = np.diff(times)
            if not np.allclose(steps, steps[0], rtol=1e-6):
                raise ValueError(
                    "input time variable is not uniformly spaced; "
                    "set bg_dt explicitly"
                )
            bg_t0, bg_dt = float(times[0]), float(steps[0])
        return prepare_time_varying(
            u, v, lat, lon, bg_t0=bg_t0, bg_dt=bg_dt, xcyclic=config.xcyclic,
            read_dtype=config.read_dtype, cal_dtype=config.cal_dtype,
        )
    return prepare(
        u, v, lat, lon, xcyclic=config.xcyclic,
        read_dtype=config.read_dtype, cal_dtype=config.cal_dtype,
    )


def _member_path(template: Optional[str], i: int) -> Optional[str]:
    """Per-member output path: {member} placeholder or _m{i:03d} suffix."""
    if template is None:
        return None
    if "{member}" in template:
        return template.format(member=i)
    root, ext = os.path.splitext(str(template))
    return f"{root}_m{i:03d}{ext}"


def _report_skeleton(config: RunConfig, paths: RunPaths, mesh) -> dict:
    """Common header of the machine-readable run report."""
    import jax

    import rwrt_tpu

    return {
        "framework": "rwrt_tpu",
        "version": getattr(rwrt_tpu, "__version__", "unknown"),
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "n_devices": jax.local_device_count(),
        "mesh": (dict(zip(mesh.axis_names, mesh.devices.shape))
                 if mesh is not None and mesh is not True else None),
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "config": dataclasses.asdict(config),
        "paths": dataclasses.asdict(paths),
    }


def _traj_summary(traj: RayTrajectories, config: RunConfig,
                  bs=None) -> dict:
    """Termination accounting + shape summary of one trajectory set.

    With a basic state, death causes are exact (termination.classify
    re-runs each killing interval in one batched call); otherwise they are
    the coarse host-side heuristic (termination.analyze).
    """
    from rwrt_tpu.diagnostics.termination import analyze, classify

    rep = classify(traj, bs, config) if bs is not None else analyze(traj)
    nt = int(np.asarray(traj.lon).shape[0])
    return {
        "nt": nt,
        "shape": list(np.asarray(traj.lon).shape),
        "n_rays": int(np.prod(np.asarray(traj.lon).shape[1:])),
        "termination": rep.counts,
        "termination_causes": "exact" if bs is not None else "heuristic",
        "final_alive_frac": float(rep.alive_frac[-1]),
    }


def _write_report(report: dict, path: str, verbose: bool) -> None:
    tmp = f"{path}.tmp"
    with open(tmp, "w") as fh:
        json.dump(report, fh, indent=2)
    os.replace(tmp, path)
    if verbose:
        print(f"wrote run report to {path}")


def _finish_report(report: dict, path: str, verbose: bool,
                   grid: dict, wall: dict) -> None:
    """Common tail of the run report (single runs and ensembles alike)."""
    report["grid"] = grid
    report["wall_s"] = {k: round(v, 4) for k, v in wall.items()}
    _write_report(report, path, verbose)


def run(config: RunConfig, paths: RunPaths, *, mesh=None, verbose: bool = True,
        chunked: bool = False, checkpoint_path: Optional[str] = None,
        wnmaps_path: Optional[str] = None,
        report_path: Optional[str] = None,
        report_exact_causes: bool = False) -> RayTrajectories:
    """Execute the full pipeline (reference real2d_hnf, main_wr.py:31-89).

    mesh: a jax.sharding.Mesh, or True to build one over
    config.mesh_devices local devices (None = all).
    wnmaps_path: also write the grid-wide wavenumber diagnostics (the
    reference's standalone WN product, wn.py:21-135) there, reusing the
    basic state this run already prepared.
    report_path: write a machine-readable JSON run report there (config
    echo, backend/mesh, phase wall-clock, termination accounting) -- the
    production-observability counterpart of the reference's prints.
    report_exact_causes: death causes in the report come from
    termination.classify (exact, one extra batched device call over the
    dead rays) instead of the free host-side heuristic.

    With a list-valued paths.inputuv the run is an ensemble sweep
    (trace_rays_ensemble): one member per file, per-member output files,
    and the return value is the list of per-member trajectories.
    """
    config.validate()
    if mesh is True:
        from rwrt_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(config.mesh_devices)
    if isinstance(paths.inputuv, (list, tuple)):
        return _run_ensemble(config, paths, mesh=mesh, verbose=verbose,
                             chunked=chunked, checkpoint_path=checkpoint_path,
                             wnmaps_path=wnmaps_path, report_path=report_path,
                             report_exact_causes=report_exact_causes)
    report = _report_skeleton(config, paths, mesh) if report_path else None
    t_start = time.perf_counter()
    bs = _load_and_prepare(paths.inputuv, config)
    t_prepare = time.perf_counter()
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
    t_trace = time.perf_counter()
    if paths.ncfile:
        ncio.write_trajectories(traj, paths.ncfile, config.zwn_array())
    if wnmaps_path:
        from rwrt_tpu.diagnostics import compute_wavenumber_maps

        zwn = np.asarray(config.zwn_array())
        maps = compute_wavenumber_maps(bs, zwn, freq=config.freq, mesh=mesh)
        ncio.write_wavenumber_maps(maps, bs, zwn, wnmaps_path)
        if verbose:
            print(f"wrote wavenumber maps to {wnmaps_path}")
    if report is not None:
        t_end = time.perf_counter()
        report["trajectories"] = _traj_summary(
            traj, config, bs if report_exact_causes else None)
        _finish_report(
            report, report_path, verbose,
            grid={"nlon": int(bs.nlon), "nlat": int(bs.nlat),
                  "time_varying": bool(bs.fields.ndim == 4)},
            wall={"prepare": t_prepare - t_start,
                  "trace": t_trace - t_prepare,
                  "io": t_end - t_trace,
                  "total": t_end - t_start},
        )
    return traj


def _run_ensemble(config: RunConfig, paths: RunPaths, *, mesh, verbose,
                  chunked, checkpoint_path, wnmaps_path, report_path=None,
                  report_exact_causes=False):
    """Ensemble sweep over a list of input wind files (BASELINE config 5).

    The fused path batches all members into one device program
    (trace_rays_ensemble); with chunked/checkpoint_path the members run
    sequentially through the chunked driver instead (bounded device memory,
    per-member checkpoint files, resumable member by member).
    """
    if wnmaps_path:
        raise ValueError(
            "wnmaps is a single-background diagnostic; compute it per "
            "member via compute_wavenumber_maps"
        )
    from rwrt_tpu.tracer import trace_rays_ensemble

    report = _report_skeleton(config, paths, mesh) if report_path else None
    n_members = len(paths.inputuv)
    grid0 = None  # (nlon, nlat, fields_ndim) of member 0

    def _check_member(m, i):
        nonlocal grid0
        if grid0 is None:
            grid0 = (m.nlon, m.nlat, m.fields.ndim)
            if verbose:
                run_banner(config, m.nlon, m.nlat)
                print(f"ensemble sweep: {n_members} members")
        else:
            if (m.nlon, m.nlat) != grid0[:2]:
                raise ValueError(
                    f"ensemble members must share one grid shape: member "
                    f"{i} is {(m.nlon, m.nlat)}, member 0 is {grid0[:2]}"
                )
            if m.fields.ndim != grid0[2]:
                raise ValueError(
                    "ensemble members must be all static or all "
                    "time-varying (mixed 2-D and 3-D input winds)"
                )
        bsfile = _member_path(paths.bsfile, i)
        if bsfile:
            ncio.write_basic_state(m, bsfile)

    t_start = time.perf_counter()
    member_reports = []
    if chunked or checkpoint_path:
        # The chunked path exists to bound device memory, so members are
        # prepared one at a time INSIDE the loop (all-up-front would hold
        # every member's full field stack on device simultaneously).
        trajs = []
        prepare_s = 0.0
        for i, p in enumerate(paths.inputuv):
            t0 = time.perf_counter()
            m = _load_and_prepare(p, config)
            prepare_s += time.perf_counter() - t0
            _check_member(m, i)
            if verbose:
                print(f"member {i}/{n_members} (chunked)")
            traj = trace_rays_chunked(
                m, config, checkpoint_path=_member_path(checkpoint_path, i),
                verbose=verbose, mesh=mesh,
            )
            trajs.append(traj)
            if report is not None:
                member_reports.append(_traj_summary(
                    traj, config, m if report_exact_causes else None))
        t_trace = time.perf_counter()
        t_prepare = t_start + prepare_s  # prepare time interleaves the loop
    else:
        members = [_load_and_prepare(p, config) for p in paths.inputuv]
        t_prepare = time.perf_counter()
        for i, m in enumerate(members):
            _check_member(m, i)
        trajs = trace_rays_ensemble(members, config, mesh=mesh)
        t_trace = time.perf_counter()
        if report is not None:
            member_reports = [
                _traj_summary(t, config, m if report_exact_causes else None)
                for t, m in zip(trajs, members)]
    for i, traj in enumerate(trajs):
        ncfile = _member_path(paths.ncfile, i)
        if ncfile:
            ncio.write_trajectories(traj, ncfile, config.zwn_array())
            if verbose:
                print(f"wrote member {i} trajectories to {ncfile}")
    if report is not None:
        t_end = time.perf_counter()
        report["n_members"] = n_members
        report["members"] = member_reports
        _finish_report(
            report, report_path, verbose,
            grid={"nlon": int(grid0[0]), "nlat": int(grid0[1]),
                  "time_varying": bool(grid0[2] == 4)},
            wall={"prepare": t_prepare - t_start,
                  "trace": t_trace - t_prepare,
                  "io": t_end - t_trace,
                  "total": t_end - t_start},
        )
    return trajs
