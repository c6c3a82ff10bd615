"""Chunked integration driver with checkpoint/resume and progress reporting.

The reference has stage-level restart only (basic state written to a file and
reloadable, reference bs.py:409-454, 461-511; initial conditions injectable,
wr.py:398-415). Mid-run checkpointing is trivial in the TPU design because the
whole integration state is one small carry: the (5, R) ray state plus, for the
adaptive solver, per-ray (t, h). This module runs the integration in chunks of
output intervals (each chunk one jitted call), persisting carry + accumulated
history between chunks, so a killed run resumes from the last chunk boundary.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from rwrt_tpu.config import RunConfig
from rwrt_tpu.models.basic_state import BasicState
import jax

from rwrt_tpu import tracer as _tracer_mod
from rwrt_tpu.tracer import (
    RayTrajectories,
    initial_step_sizes,
    initialize,
    make_background,
    source_matrix,
    _rk45_chunk,
    _rk45_group_chunk,
    _rk4_chunk,
)
from rwrt_tpu.utils.observability import Progress, run_banner


def _take_lanes(arr, idx, mesh):
    """Gather along the trailing lane axis; reshard when running on a mesh.

    The one helper behind every lane reorder/subset in the chunked driver
    (resorting, mid-run compaction) so the set of carries each site must
    permute stays the only difference between them."""
    out = jnp.take(arr, jnp.asarray(idx), axis=-1)
    if mesh is not None:
        from rwrt_tpu.parallel import sharding as _sh

        out = _sh.shard_rays(out, mesh)
    return out


def _save(path, step, y, t, h, hist, lanes, n_rays):
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp, step=step, y=np.asarray(y), t=np.asarray(t), h=np.asarray(h),
        lanes=np.asarray(lanes), n_rays=n_rays,
        **{f"hist_{k}": v for k, v in hist.items()},
    )
    os.replace(tmp, path)


def _load(path):
    with np.load(path) as ds:
        step = int(ds["step"])
        y, t, h = ds["y"], ds["t"], ds["h"]
        lanes = ds["lanes"] if "lanes" in ds.files else None
        n_rays = int(ds["n_rays"]) if "n_rays" in ds.files else None
        hist = {k[5:]: ds[k] for k in ds.files if k.startswith("hist_")}
    return step, y, t, h, hist, lanes, n_rays


class ChunkBudgetReached(RuntimeError):
    """Raised by trace_rays_chunked(max_chunks=...) after the budgeted
    number of chunks: the checkpoint (and any streamed history) hold
    everything computed so far; re-invoking with the same checkpoint_path
    resumes. Lets a caller bound one PROCESS's accumulated device
    execution (some remote workers fault past a few seconds of it) and
    chain attempts, the way bench.py chains span subprocesses."""

    def __init__(self, step, nt):
        super().__init__(f"chunk budget reached at output step {step}/{nt}")
        self.step = step
        self.nt = nt


def trace_rays_chunked(
    bs: BasicState,
    config: RunConfig,
    *,
    chunk_steps: int = 64,
    checkpoint_path: Optional[str] = None,
    resume: bool = True,
    verbose: bool = True,
    source_lon=None,
    source_lat=None,
    mesh=None,
    sort_rays: bool = False,
    initial_state=None,
    stream_dir: Optional[str] = None,
    compact_min_width: int = 256,
    max_chunks: Optional[int] = None,
) -> RayTrajectories:
    """Like tracer.trace_rays but chunked, with progress + checkpointing.

    sort_rays: reorder ray lanes by their current background grid cell at
    every chunk boundary (host-side). Per-ray results are bit-identical
    (every device op is elementwise along the lane axis), but the hot-loop
    gather touches the field stack in near-sorted order, and dead (NaN) rays
    cluster at the end. History is written back through the lane->ray map so
    outputs are in the original order.

    max_chunks: cooperative chunk budget -- after this many chunks the
    driver checkpoints (checkpoint_path required) and raises
    ChunkBudgetReached instead of continuing; re-invoke to resume.

    stream_dir: stream the history to disk instead of holding it in host
    RAM -- one memmapped ``<var>.npy`` per output variable, written chunk by
    chunk (a 90-day 100k-ray float32 run is ~3 GB of history). The returned
    trajectories are memmap-backed numpy arrays; convert with
    ``ncio.write_trajectories`` as usual or reopen the .npy files directly.

    compact_min_width: floor of the dead-lane-compaction width ladder (see
    RunConfig.compact_dead); widths below this are not worth a recompile.
    """
    config.validate()
    dtype = bs.fields.dtype
    if source_lon is None:
        source_lon, source_lat = source_matrix(
            config.sw_lon, config.sw_lat, config.dlon, config.dlat,
            config.nnx, config.nny,
        )
    source_lon = jnp.asarray(source_lon, dtype)
    source_lat = jnp.asarray(source_lat, dtype)
    zwn = jnp.asarray(config.zwn_array(), dtype)

    bg = make_background(bs, config.freq)
    y0, ug0, vg0 = initialize(bg, source_lon, source_lat, zwn,
                              config.root_order)
    if initial_state is not None:
        # The reference's initial-condition injection hook (wr.py:398-415).
        from rwrt_tpu.models import ray as ray_mod_

        y0 = jnp.asarray(initial_state, dtype)
        if y0.shape != (5, 3 * source_lon.shape[0] * len(config.zwn)):
            raise ValueError(f"initial_state shape {y0.shape} mismatch")
        ug0, vg0 = ray_mod_.group_velocity_at(
            bg, y0[0], y0[1], y0[2], y0[3], zero_invalid=True
        )
    nt = config.nt
    n_rays = y0.shape[1]
    y0_full, ug0_full, vg0_full = y0, ug0, vg0
    lane_to_ray = np.arange(n_rays)
    if config.compact_rootless:
        idx = _tracer_mod.compact_lane_indices(np.isfinite(np.asarray(y0[4])))
        if idx is not None:
            lane_to_ray = idx
            take = jnp.asarray(idx)
            y0 = jnp.take(y0, take, axis=1)
            ug0 = jnp.take(ug0, take)
            vg0 = jnp.take(vg0, take)

    if mesh is not None:
        from rwrt_tpu.parallel import sharding as sh

        n_shards = mesh.devices.size
        y0, _ = sh.pad_rays(y0, n_shards)
        ug0, _ = sh.pad_rays(ug0, n_shards)
        vg0, _ = sh.pad_rays(vg0, n_shards)
        y0 = sh.shard_rays(y0, mesh)
        bg = sh.replicate(bg, mesh)
        if lane_to_ray.shape[0] != y0.shape[1]:
            # padded NaN lanes map past the hist width and are dropped on
            # write via the mask below; give them out-of-range slots.
            lane_to_ray = np.concatenate([
                lane_to_ray,
                np.arange(y0.shape[1] - lane_to_ray.shape[0]) + n_rays,
            ])
    n_lanes = y0.shape[1]
    if config.state_dtype == "float64":
        # Mixed precision (DESIGN.md section 7): wide state/controller; the
        # RHS casts back to the background's compute dtype at its entry.
        y0 = y0.astype(jnp.float64)
        if y0.dtype != jnp.float64:
            raise RuntimeError(
                "state_dtype='float64' needs jax_enable_x64 "
                "(jax.config.update('jax_enable_x64', True))"
            )
        dtype = y0.dtype
    dt = jnp.asarray(config.tstep, dtype)
    cut_off = jnp.asarray(config.cut_off_rad, dtype)
    from rwrt_tpu.solvers import rk45 as _rk45_mod

    rtol = _rk45_mod.validate_tol(config.rtol, dtype)
    atol = jnp.asarray(config.atol, dtype)
    min_step = jnp.asarray(
        min(config.min_step_factor * config.tstep, config.tstep * 1e-3), dtype
    )
    # Straggler pin-kill thresholds as device scalars (once per run, not per
    # chunk: through a remote-device tunnel every host scalar is a round
    # trip). None = disabled (the dense integrator's never-fires path).
    pin_limit = pin_mwn = None
    if config.pin_limit is not None:
        pin_limit = jnp.asarray(int(config.pin_limit), jnp.int32)
        pin_mwn = jnp.asarray(config.pin_mwn, dtype)

    if verbose:
        run_banner(config, bs.nlon, bs.nlat)

    compacted = lane_to_ray.shape[0] != n_rays or (
        lane_to_ray != np.arange(n_rays)).any()
    hist_w = max(n_rays, int(lane_to_ray.max()) + 1 if n_lanes else n_rays)
    hist_dtype = np.asarray(y0).dtype

    # Load and VALIDATE any checkpoint before touching the stream files:
    # a rejected resume (mismatched source config / mesh) must raise while
    # the user's streamed history from the original run is still intact.
    y = y0
    t = jnp.zeros(n_lanes, dtype)
    h = None
    start = 1
    hist_l = {}

    if checkpoint_path and resume and os.path.exists(checkpoint_path):
        step, y_np, t_np, h_np, hist_l, lanes_np, n_rays_ck = _load(
            checkpoint_path)
        start = step
        if lanes_np is not None:
            # Adopt the stored lane set and order outright: it may be a
            # mid-run dead-lane-compaction SUBSET of the fresh map (every
            # device op is elementwise along the lane axis, so lane order
            # is free). Lanes are stored in canonical sorted-by-ray order.
            # The subset check alone cannot tell a compaction subset from a
            # checkpoint written under a SMALLER source configuration (whose
            # lane ids name different rays here), so the total ray count is
            # stored alongside and must match exactly.
            lanes_np = np.asarray(lanes_np)
            if n_rays_ck is not None and n_rays_ck != n_rays:
                raise ValueError(
                    f"checkpoint was written for {n_rays_ck} rays but this "
                    f"run has {n_rays}; the source configuration differs"
                )
            if y_np.shape[-1] != lanes_np.shape[0]:
                raise ValueError(
                    f"corrupt checkpoint: state width {y_np.shape[-1]} != "
                    f"lane-map width {lanes_np.shape[0]}"
                )
            real = lanes_np[lanes_np < n_rays]
            if not np.isin(real, lane_to_ray).all():
                raise ValueError(
                    "checkpoint lane map is not a subset of this run's "
                    "lanes; the checkpoint was written with a different "
                    "compact_rootless setting or source configuration"
                )
            if lanes_np.size and int(lanes_np.max()) >= hist_w:
                raise ValueError(
                    "checkpoint was written under a different mesh padding; "
                    "resume with the same mesh configuration"
                )
            if mesh is not None and lanes_np.shape[0] % mesh.devices.size:
                raise ValueError(
                    f"checkpoint lane count {lanes_np.shape[0]} does not "
                    f"divide over {mesh.devices.size} mesh devices; resume "
                    "with the mesh it was written under"
                )
            lane_to_ray = lanes_np
            n_lanes = lanes_np.shape[0]
            y = jnp.asarray(y_np)
            t = jnp.asarray(t_np)
            h = jnp.asarray(h_np) if h_np.ndim else None
            if mesh is not None:
                from rwrt_tpu.parallel import sharding as _sh

                y = _sh.shard_rays(y, mesh)
                t = _sh.shard_rays(t, mesh)
                if h is not None:
                    h = _sh.shard_rays(h, mesh)
        else:
            # Legacy checkpoint without a lane map: full width, canonical
            # (sorted-by-ray) order; map back to the current lane order
            # (compaction pads can make lane_to_ray non-monotonic).
            if y_np.shape[-1] != n_lanes:
                raise ValueError(
                    f"checkpoint lane count {y_np.shape[-1]} != {n_lanes}; "
                    "the checkpoint was written with a different "
                    "compact_rootless setting or source configuration"
                )
            rank = np.argsort(np.argsort(lane_to_ray))
            y = jnp.take(jnp.asarray(y_np), jnp.asarray(rank), axis=1)
            t = jnp.take(jnp.asarray(t_np), jnp.asarray(rank))
            h = (jnp.take(jnp.asarray(h_np), jnp.asarray(rank))
                 if h_np.ndim else None)
        if verbose:
            print(f"resumed from {checkpoint_path} at step {start}")

    if stream_dir:
        os.makedirs(stream_dir, exist_ok=True)
        resuming = bool(checkpoint_path and resume
                        and os.path.exists(checkpoint_path))

        def _alloc(k):
            path = os.path.join(stream_dir, f"{k}.npy")
            old = None
            if resuming and os.path.exists(path):
                try:
                    old = np.load(path, mmap_mode="r")
                except (ValueError, OSError):
                    old = None
                if old is not None and (old.ndim != 2
                                        or old.shape[1] != hist_w):
                    old = None
            m = np.lib.format.open_memmap(
                path + ".new", mode="w+", dtype=hist_dtype,
                shape=(nt, hist_w))
            m[:] = np.nan
            if old is not None:
                rows = min(old.shape[0], nt)
                m[:rows] = old[:rows]
                del old
            m.flush()
            # The mapping follows the inode, so the rename keeps m valid.
            os.replace(path + ".new", path)
            return m

        hist = {k: _alloc(k)
                for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg")}
    else:
        hist = {
            k: np.full((nt, hist_w), np.nan, hist_dtype)
            for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg")
        }
    for i, k in enumerate(("lon", "lat", "kx", "ky", "amp")):
        hist[k][0, :n_rays] = np.asarray(y0_full[i])
    hist["ug"][0, :n_rays] = np.asarray(ug0_full)
    hist["vg"][0, :n_rays] = np.asarray(vg0_full)
    if compacted and config.integrator == "rk45":
        # The adaptive solver freezes rootless lanes at their seed state
        # forever (finite lon/lat/kx, NaN ky/amp/ug/vg; reference
        # rkf45.py:400-403); fill those rows up front. RK4 NaNs them at
        # step 1 (reference wr.py:593-618) -- the default NaN prefill.
        frozen = ~np.isfinite(np.asarray(y0_full[4]))
        for i, k in enumerate(("lon", "lat", "kx")):
            hist[k][1:, :n_rays][:, frozen] = (
                np.asarray(y0_full[i])[frozen][None])

    # Apply checkpointed history rows (streamed runs keep their history in
    # the stream_dir memmaps; the checkpoint then carries no hist_* arrays).
    for k in hist_l:
        hist[k][: hist_l[k].shape[0]] = hist_l[k]

    if config.integrator == "rk45" and h is None:
        h = initial_step_sizes(bg, y, rtol, atol)
    elif h is None:
        h = jnp.zeros(n_lanes, dtype)

    # Group-path carry: FSAL derivative and the last saved position (for the
    # haversine kill). Both are recoverable at any chunk boundary: f is
    # rhs(t, y) by the FSAL invariant, prev is the carry state itself (y IS
    # the last saved masked state), so checkpoints need not store them.
    from rwrt_tpu.models import ray as _ray_mod

    if config.integrator == "rk45":
        # The FSAL invariant is f = rhs(y, t) at each ray's OWN time: for a
        # time-varying background the RHS samples the background at t, so
        # recomputing the carry at t=0 after a resume would evaluate the
        # wrong frame for every ray. rhs broadcasts a per-ray t vector.
        f_carry, _ = jax.jit(_ray_mod.rhs)(bg, y, t)
        prev_lon, prev_lat = y[0], y[1]
        # Difficulty signal for bucketed scheduling: -1 = no signal yet (the
        # first chunk falls back to the in-program remaining-time/h estimate).
        prev_att = jnp.full(n_lanes, -1, jnp.int32)

    def _resort():
        """Reorder lanes by current grid cell (stable; NaN lanes last)."""
        nonlocal y, t, h, f_carry, prev_lon, prev_lat, prev_att, lane_to_ray
        ylon = np.asarray(y[0])
        ylat = np.asarray(y[1])
        two_pi = 2.0 * np.pi
        w = bs.fields.shape[-3] if bs.fields.ndim == 4 else bs.fields.shape[0]
        hgt = bs.lat.shape[0]
        ix = np.floor((ylon % two_pi - float(bs.lon[0])) / bs.dx)
        iy = np.floor((ylat - float(bs.lat[0])) / bs.dy)
        cell = np.clip(ix, 0, w - 1) * hgt + np.clip(iy, 0, hgt - 1)
        cell = np.where(np.isfinite(cell), cell, np.inf)
        order = np.argsort(cell, kind="stable")
        if np.array_equal(order, np.arange(n_lanes)):
            return
        lane_to_ray = lane_to_ray[order]

        def perm(a):
            return _take_lanes(a, order, mesh)

        y = perm(y)
        t = perm(t)
        h = perm(h)
        if config.integrator == "rk45":
            f_carry = perm(f_carry)
            prev_lon = perm(prev_lon)
            prev_lat = perm(prev_lat)
            prev_att = perm(prev_att)

    # Run-level death accounting (the TPU-native replacement for the
    # reference's all-dead early exit, wr.py:735-736, and the RK45 'failed'
    # status, rkf45.py:423-425): the history slices are already fetched to
    # host every chunk, so checking costs nothing on device. "Born" keys on
    # the initial amplitude -- rootless lanes keep a finite frozen position
    # forever (matching the reference's numpy freeze semantics) and must not
    # count as alive.
    n_born = int(np.isfinite(np.asarray(y0_full[4])).sum())
    all_dead_at: Optional[int] = None

    progress = Progress(nt - 1) if verbose else None
    step = start
    chunks_done = 0
    while step < nt:
        if sort_rays:
            _resort()
        n = min(chunk_steps, nt - step)
        t_bounds = (jnp.arange(step, step + n, dtype=dtype)) * dt
        if config.integrator == "rk4":
            t_start = jnp.asarray((step - 1) * config.tstep, dtype)
            y, (ys, ugs, vgs) = _rk4_chunk(bg, y, dt, n, cut_off, t_start)
            ray_steps = n * n_lanes
        elif config.interval_batch > 1:
            if mesh is not None:
                shard_lanes = n_lanes // mesh.devices.size
                k_mesh = (config.difficulty_buckets
                          if (config.difficulty_buckets > 1
                              and shard_lanes >= 8 * config.difficulty_buckets)
                          else 1)
                (y, t, h, f_carry, prev_lon, prev_lat), (
                    ys, ugs, vgs, iters, _, prev_att) = (
                    _tracer_mod._rk45_group_chunk_shardmap(
                        mesh, bg, y, t, h, f_carry, prev_lon, prev_lat,
                        t_bounds, cut_off, rtol, atol, min_step,
                        prev_att=prev_att,
                        dense=(config.bound_mode == "dense"),
                        k_buckets=k_mesh,
                        pin_limit=pin_limit, pin_mwn=pin_mwn,
                    ))
                # iters is per-shard (and per-slice-summed when bucketed);
                # each iteration advances one shard's lanes (one slice's
                # when bucketed).
                unit = (((-(-shard_lanes // k_mesh) + 7) // 8) * 8
                        if k_mesh > 1 else shard_lanes)
                ray_steps = int(np.asarray(iters).sum()) * unit
            elif (config.difficulty_buckets > 1
                  and n_lanes >= 8 * config.difficulty_buckets):
                (y, t, h, f_carry, prev_lon, prev_lat), (
                    ys, ugs, vgs, iters, _, prev_att) = (
                    _tracer_mod._rk45_group_chunk_bucketed(
                        bg, y, t, h, f_carry, prev_lon, prev_lat, t_bounds,
                        cut_off, rtol, atol, min_step, prev_att,
                        k_buckets=config.difficulty_buckets,
                        dense=(config.bound_mode == "dense"),
                        pin_limit=pin_limit, pin_mwn=pin_mwn,
                    ))
                # iters is per-slice; each iteration advances one slice of
                # ceil(n_lanes / K) lanes.
                slice_lanes = -(-n_lanes // config.difficulty_buckets)
                slice_lanes = ((slice_lanes + 7) // 8) * 8
                ray_steps = int(np.asarray(iters).sum()) * slice_lanes
            elif config.bound_mode == "dense" and config.peel:
                (y, t, h, f_carry, prev_lon, prev_lat), (
                    ys, ugs, vgs, iters, _, _la) = (
                    _tracer_mod._rk45_group_chunk_dense_peeled(
                        bg, y, t, h, f_carry, prev_lon, prev_lat, t_bounds,
                        cut_off, rtol, atol, min_step,
                        caps=tuple(config.peel_caps),
                        pin_limit=pin_limit, pin_mwn=pin_mwn,
                    ))
                # peeled iters is already lane-iteration units
                ray_steps = int(np.asarray(iters))
            elif config.bound_mode == "dense":
                (y, t, h, f_carry, prev_lon, prev_lat), (
                    ys, ugs, vgs, iters, _, _la) = (
                    _tracer_mod._rk45_group_chunk_dense(
                        bg, y, t, h, f_carry, prev_lon, prev_lat, t_bounds,
                        cut_off, rtol, atol, min_step,
                        pin_limit=pin_limit, pin_mwn=pin_mwn,
                    ))
                ray_steps = int(np.asarray(iters)) * n_lanes
            elif config.peel and n_lanes >= 64:
                # Exact mode under peel scheduling: bitwise-equal to the
                # plain chunk, immune to its straggler catastrophe (a lane
                # pinned near the step floor late in a long run makes the
                # full batch pay its thousands of trips).
                (y, t, h, f_carry, prev_lon, prev_lat), (
                    ys, ugs, vgs, iters, _, _la) = (
                    _tracer_mod._rk45_group_chunk_peeled(
                        bg, y, t, h, f_carry, prev_lon, prev_lat, t_bounds,
                        cut_off, rtol, atol, min_step,
                        caps=(None if config.peel_caps_exact is None
                              else tuple(config.peel_caps_exact)),
                    ))
                # peeled iters is already lane-iteration units
                ray_steps = int(np.asarray(iters))
            else:
                (y, t, h, f_carry, prev_lon, prev_lat), (
                    ys, ugs, vgs, iters, _, _la) = _rk45_group_chunk(
                    bg, y, t, h, f_carry, prev_lon, prev_lat, t_bounds,
                    cut_off, rtol, atol, min_step,
                )
                ray_steps = int(np.asarray(iters)) * n_lanes
        else:
            if mesh is not None:
                (y, t, h), (ys, ugs, vgs, iters, _) = (
                    _tracer_mod._rk45_chunk_shardmap(
                        mesh, bg, y, t, h, t_bounds, cut_off, rtol, atol,
                        min_step,
                    )
                )
                ray_steps = int(np.asarray(iters).sum()) * (
                    n_lanes // mesh.devices.size)
            else:
                (y, t, h), (ys, ugs, vgs, iters, _) = _rk45_chunk(
                    bg, y, t, h, t_bounds, cut_off, rtol, atol, min_step
                )
                ray_steps = int(np.asarray(iters).sum()) * n_lanes
        ys = np.asarray(ys)
        for i, k in enumerate(("lon", "lat", "kx", "ky", "amp")):
            hist[k][step : step + n, lane_to_ray] = ys[:, i]
        hist["ug"][step : step + n, lane_to_ray] = np.asarray(ugs)
        hist["vg"][step : step + n, lane_to_ray] = np.asarray(vgs)
        alive_per_step = np.isfinite(ys[:, 4]).sum(axis=1)
        # Early exit keys on POSITION NaN, not amplitude: a born lane whose
        # amp overflowed to NaN while its position stayed finite (the
        # amp-row-only IEEE propagation of the RHS) is frozen at a FINITE
        # state that the uninterrupted run would keep emitting at every
        # remaining bound -- the NaN tail prefill would misrepresent it, so
        # such lanes block the exit instead (rare; costs nothing).
        born_lane = np.zeros(hist_w, dtype=bool)
        born_lane[:n_rays] = np.isfinite(np.asarray(y0_full[4]))
        born_lane = born_lane[lane_to_ray]
        fully_dead = (~np.isfinite(ys[:, 0]) | ~born_lane[None, :]).all(axis=1)
        if n_born > 0 and fully_dead[-1]:
            all_dead_at = step + int(np.argmax(fully_dead))
        step += n
        if progress:
            progress.update(
                step - 1, ray_steps,
                alive_frac=alive_per_step[-1] / max(n_born, 1),
            )
        if checkpoint_path:
            # Persist the carry in ORIGINAL ray order so resume (which
            # recomputes f/prev and restarts the lane map) is order-free.
            inv = np.argsort(lane_to_ray)
            _save(
                checkpoint_path, step,
                np.asarray(y)[:, inv], np.asarray(t)[inv],
                np.asarray(h)[inv] if h is not None else np.zeros(()),
                # Streamed history is already durable in its own memmaps.
                {} if stream_dir else {k: v[:step] for k, v in hist.items()},
                lane_to_ray[inv], n_rays,
            )
            if stream_dir:
                for v in hist.values():
                    v.flush()
        chunks_done += 1
        if (max_chunks is not None and chunks_done >= max_chunks
                and step < nt and all_dead_at is None):
            # all_dead takes precedence: that path COMPLETES the run for
            # free (tail prefill on host), so never trade it for a resume.
            if not checkpoint_path:
                raise ValueError("max_chunks needs checkpoint_path")
            raise ChunkBudgetReached(step, nt)
        if all_dead_at is not None:
            # Every born ray is dead: the remaining history is fully
            # determined (NaN for dead rays; never-born rootless lanes stay
            # frozen at their seed position forever, matching the freeze
            # semantics of both integrators), so stop integrating (reference
            # wr.py:735-736, 853-855) -- at chunk granularity, with no extra
            # device syncs -- and fill the tail on host.
            frozen = ~np.isfinite(np.asarray(y0_full[4]))
            if frozen.any() and step < nt and config.integrator == "rk45":
                # (rk4 NaNs rootless lanes from step 1, so the NaN prefill
                # already matches its tail.)
                for i, k in enumerate(("lon", "lat", "kx")):
                    hist[k][step:, :n_rays][:, frozen] = (
                        np.asarray(y0_full[i])[frozen][None])
            if verbose:
                print(f"\nall {n_born} born rays terminated by output step "
                      f"{all_dead_at}; stopping early")
            break
        if config.compact_dead and step < nt:
            # Mid-run dead-lane compaction (exact; RunConfig.compact_dead):
            # a lane whose last EMITTED position is NaN was killed and emits
            # NaN at every remaining bound in both integrators, so it can
            # leave the device batch -- its history rows are already the NaN
            # prefill. Lanes frozen at a FINITE state (rootless, amp-only
            # NaN) read as alive here and are never dropped. The width
            # shrinks along a power-of-two ladder with dead lanes as filler,
            # so each rung's program compiles once.
            alive = np.isfinite(ys[-1, 0])
            n_alive = int(alive.sum())
            target = 1 << (max(n_alive, 1) - 1).bit_length()
            target = max(target, compact_min_width)
            if mesh is not None:
                n_shards = mesh.devices.size
                target = -(-target // n_shards) * n_shards
            if target < n_lanes:
                keep = np.flatnonzero(alive)
                filler = np.flatnonzero(~alive)[: target - n_alive]
                kept = np.sort(np.concatenate([keep, filler]))
                lane_to_ray = lane_to_ray[kept]
                n_lanes = int(kept.shape[0])

                def _pick(a):
                    return _take_lanes(a, kept, mesh)

                y = _pick(y)
                t = _pick(t)
                h = _pick(h)
                if config.integrator == "rk45":
                    f_carry = _pick(f_carry)
                    prev_lon = _pick(prev_lon)
                    prev_lat = _pick(prev_lat)
                    prev_att = _pick(prev_att)
                if verbose:
                    print(f"\ncompacted device batch to {n_lanes} lanes "
                          f"({n_alive} alive)")

    nsource = source_lon.shape[0]
    out_shape = (nt, 3, nsource, len(config.zwn))
    r_orig = 3 * nsource * len(config.zwn)
    if stream_dir:
        # Memmap-backed views (numpy reshape stays a view when hist_w ==
        # r_orig; with pad columns it copies the slice).
        traj = RayTrajectories(
            **{
                k: hist[k][:, :r_orig].reshape(out_shape)
                for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg")
            }
        )
    else:
        traj = RayTrajectories(
            **{
                k: jnp.asarray(hist[k][:, :r_orig].reshape(out_shape))
                for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg")
            }
        )
    if verbose:
        from rwrt_tpu.diagnostics import termination

        rep = termination.analyze(traj)
        print("termination summary: "
              + "  ".join(f"{k}={v}" for k, v in rep.counts.items()))
    return traj
