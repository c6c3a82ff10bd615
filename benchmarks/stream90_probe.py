"""90-day streamed run on device (VERDICT r3 item 7; reference default
ttotal, /root/reference/main_wr.py:16) through the production chunked
driver with disk streaming + checkpoint/resume.

The axon TPU worker faults once one process accumulates more than a few
seconds of device execution, so one invocation advances at most
STREAM90_MAX_CHUNKS chunks (trace_rays_chunked(max_chunks=...)), exits 3,
and the campaign loop re-invokes; the checkpoint + streamed memmaps carry
everything across attempts. Exit 0 only when the full 90 days are on disk,
writing benchmarks/r4_results/stream90.json with wall/peak-RSS/stream
throughput (the wall there is the SUM of per-attempt chunk-loop walls --
process restart and resume-reload time is excluded, same accounting as
bench.py's resume-chained spans).

Workload: the bench workload (4800 random sources x 7 zwn, climatology
background, 2 h cadence) extended to the reference's 90-day default.
Mode: dense + peel (the bench default); BENCH_PIN_LIMIT is honored so the
row names its mode.

Usage: python benchmarks/stream90_probe.py   (TPU)
  env: STREAM90_DAYS (90), STREAM90_NSOURCE (4800),
       STREAM90_MAX_CHUNKS (2), STREAM90_CHUNK (30),
       BENCH_PIN_LIMIT/BENCH_PIN_MWN (off), BENCH_CACHE_DIR.
"""

import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "BENCH_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

import rwrt_tpu as rt  # noqa: E402
from rwrt_tpu.config import RunConfig  # noqa: E402
from rwrt_tpu.utils import checkpoint as ckpt  # noqa: E402
from bench import climatology_background  # noqa: E402


def main():
    days = float(os.environ.get("STREAM90_DAYS", "90"))
    nsource = int(os.environ.get("STREAM90_NSOURCE", "4800"))
    max_chunks = int(os.environ.get("STREAM90_MAX_CHUNKS", "2"))
    chunk = int(os.environ.get("STREAM90_CHUNK", "30"))
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.environ.get("PROBE_RESULTS", "r4_results"))
    os.makedirs(out_dir, exist_ok=True)
    work = os.path.join(out_dir, "stream90_work")
    os.makedirs(work, exist_ok=True)
    ck = os.path.join(work, "ck.npz")
    walls_path = os.path.join(work, "walls.json")

    dtype = "float32"
    u, v, lat, lon = climatology_background()
    bs = rt.prepare(u, v, lat, lon, cal_dtype=dtype)

    rng = np.random.default_rng(0)
    slon = rng.uniform(0, 2 * np.pi, nsource)
    slat = rng.uniform(np.radians(-65), np.radians(65), nsource)

    pin = os.environ.get("BENCH_PIN_LIMIT", "")
    cfg = RunConfig(
        zwn=tuple(float(z) for z in range(1, 8)),
        sw_lon=0.0, sw_lat=0.0, dlon=1.0, dlat=1.0, nnx=1, nny=1,
        tstep=7200.0, ttotal=days * 86400.0,
        cal_dtype=dtype, integrator="rk45", bound_mode="dense",
        pin_limit=int(pin) if pin else None,
        pin_mwn=float(os.environ.get("BENCH_PIN_MWN", "50")),
    )

    walls = json.load(open(walls_path)) if os.path.exists(walls_path) else []
    t0 = time.perf_counter()
    try:
        traj = ckpt.trace_rays_chunked(
            bs, cfg, chunk_steps=chunk, checkpoint_path=ck,
            stream_dir=work, verbose=True, max_chunks=max_chunks,
            source_lon=jnp.asarray(slon), source_lat=jnp.asarray(slat),
        )
    except ckpt.ChunkBudgetReached as e:
        wall = time.perf_counter() - t0
        walls.append(wall)
        json.dump(walls, open(walls_path, "w"))
        print(f"# budget: step {e.step}/{e.nt}, attempt wall {wall:.1f} s "
              f"({len(walls)} attempts so far)", flush=True)
        raise SystemExit(3)
    wall = time.perf_counter() - t0
    walls.append(wall)
    json.dump(walls, open(walls_path, "w"))

    nt = cfg.nt
    n_rays = 3 * nsource * len(cfg.zwn)
    stream_bytes = sum(
        os.path.getsize(os.path.join(work, f"{k}.npy"))
        for k in ("lon", "lat", "kx", "ky", "amp", "ug", "vg")
        if os.path.exists(os.path.join(work, f"{k}.npy")))
    total_wall = sum(walls)
    rec = {
        "days": days, "nsource": nsource, "n_rays": n_rays, "nt": nt,
        "attempts": len(walls),
        "wall_s_total": round(total_wall, 3),
        "wall_s_per_attempt": [round(w, 3) for w in walls],
        "ray_steps_per_sec": round(n_rays * (nt - 1) / total_wall, 1),
        "stream_bytes": stream_bytes,
        "stream_MB_per_s": round(stream_bytes / 2 ** 20 / total_wall, 1),
        "peak_rss_MB": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1),
        "alive_at_end": int(np.isfinite(np.asarray(traj.lon[-1])).sum()),
        "pin": [int(pin), float(os.environ.get("BENCH_PIN_MWN", "50"))]
        if pin else None,
        "chunk_steps": chunk,
    }
    with open(os.path.join(out_dir, "stream90.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
