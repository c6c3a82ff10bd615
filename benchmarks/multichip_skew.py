"""Per-shard loop-count skew at north-star shape (VERDICT r3 item 6).

The multi-chip claim rests on shard-local while_loops with zero hot-loop
collectives (tests/test_shardmap.py): 8-chip wall = MAX-shard wall, not
mean. This probe runs the north-star-SHAPED workload (4800 random sources
x 7 zwn, the bench seeding -- not the 384-ray toy) on the virtual 8-device
CPU mesh through the production shard_map chunk and records per-shard
device-loop trip counts per chunk, so the projection

    projected 8-chip wall = single-chip wall x (max-shard units / mean)
                            / n_shards

uses MEASURED skew. Trip counts are hardware-independent (the controller
is deterministic; CPU vs TPU differ at codegen-ULP level which does not
move counts at this aggregation), so CPU trips are a faithful stand-in
for chip-time shares.

Two work metrics per shard per chunk:

  trips     device-loop iterations of the shard's while_loop (what the
            implemented runner pays; with SKEW_BUCKETS > 1 this is the sum
            over the shard's sequential difficulty buckets -- the
            production multi-chip scheduling, tracer k_buckets);
  attempts  per-lane solver step attempts summed over the shard's lanes
            (scheduler-independent work content; the lower bound any
            shard-local scheduler can approach).

Usage: python benchmarks/multichip_skew.py   (forces CPU itself)
  env: SKEW_DAYS (default 10; 30 = full north star, slower),
       SKEW_NSOURCE (4800), SKEW_SHARDS (8), SKEW_CHUNK (60),
       SKEW_BUCKETS (default 8 = the bucketed sharded runner; 1 = plain
       dense full-width loops, much slower on late straggler chunks),
       SKEW_PIN_LIMIT / SKEW_PIN_MWN (arm the straggler pin-kill, the
       production multi-chip recommendation: an unretired grinder made one
       shard pay ~1M loop trips in the day-10..15 chunk of the unpinned
       run -- see multichip_skew_unpinned_partial.json),
       SKEW_OUT (output basename, default multichip_skew).
Writes benchmarks/r4_results/multichip_skew.json incrementally (per chunk),
with complete=true on the final write.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
nshards = int(os.environ.get("SKEW_SHARDS", "8"))

import jax  # noqa: E402

# The ambient sitecustomize imports jax at interpreter start with the axon
# TPU plugin pinned, overriding the env var -- re-override via jax.config
# (same dance as tests/conftest.py). This probe must NOT touch the TPU: it
# measures deterministic trip counts, and the tunnel serves one client.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", nshards)

import jax.numpy as jnp  # noqa: E402

import rwrt_tpu as rt  # noqa: E402
from rwrt_tpu import tracer  # noqa: E402
from rwrt_tpu.models import ray as ray_mod  # noqa: E402
from rwrt_tpu.solvers import rk45 as rk45_mod  # noqa: E402
from rwrt_tpu.parallel import sharding as sh  # noqa: E402
from bench import climatology_background  # noqa: E402


def main():
    days = float(os.environ.get("SKEW_DAYS", "10"))
    nsource = int(os.environ.get("SKEW_NSOURCE", "4800"))
    chunk = int(os.environ.get("SKEW_CHUNK", "60"))
    dtype = "float32"
    tstep = 7200.0
    nt_m1 = int(days * 86400.0 / tstep)

    u, v, lat, lon = climatology_background()
    bs = rt.prepare(u, v, lat, lon, cal_dtype=dtype)
    bg = tracer.make_background(bs, freq=0.0)

    rng = np.random.default_rng(0)
    slon = jnp.asarray(rng.uniform(0, 2 * np.pi, nsource), dtype)
    slat = jnp.asarray(
        rng.uniform(np.radians(-65), np.radians(65), nsource), dtype)
    zwn = jnp.asarray(np.arange(1, 8, dtype=np.float64), dtype)
    y0, _, _ = tracer.initialize(bg, slon, slat, zwn)
    idx = tracer.compact_lane_indices(np.isfinite(np.asarray(y0[4])))
    if idx is not None:
        y0 = jnp.take(y0, jnp.asarray(idx), axis=1)

    mesh = sh.make_mesh(nshards)
    y0, _ = sh.pad_rays(y0, nshards)
    n_lanes = y0.shape[1]
    y0 = sh.shard_rays(y0, mesh)
    bg = sh.replicate(bg, mesh)

    rtol = rk45_mod.validate_tol(jnp.asarray(1e-6, dtype), dtype)
    atol = jnp.asarray(1e-6, dtype)
    min_step = jnp.asarray(1e-3 * tstep, dtype)
    dt = jnp.asarray(tstep, dtype)
    cut_off = jnp.asarray(0.1 * tstep / 3600.0, dtype)

    h0 = tracer.initial_step_sizes(bg, y0, rtol, atol)
    f0, _ = ray_mod.rhs(bg, y0)
    carry = (y0, jnp.zeros(n_lanes, dtype), h0, f0, y0[0], y0[1])

    buckets = int(os.environ.get("SKEW_BUCKETS", "8"))
    pin_env = os.environ.get("SKEW_PIN_LIMIT", "")
    pin_kw = {}
    if pin_env:
        pin_kw = dict(
            pin_limit=jnp.asarray(int(pin_env), jnp.int32),
            pin_mwn=jnp.asarray(
                float(os.environ.get("SKEW_PIN_MWN", "50")), dtype))
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        os.environ.get("PROBE_RESULTS", "r4_results"),
        os.environ.get("SKEW_OUT", "multichip_skew") + ".json")
    os.makedirs(os.path.dirname(out), exist_ok=True)

    per_chunk = []      # (n_chunks, n_shards) trip counts
    att_chunk = []      # (n_chunks, n_shards) lane-attempt sums
    trunc_chunk = []    # (n_chunks, n_shards) bool: shard left lanes
                        # unfinished at the chunk barrier (max_iters cut a
                        # bucket's loop short)
    walls = []
    per_shard = n_lanes // nshards
    prev_att = None
    step = 1

    def _write(complete):
        pc = np.asarray(per_chunk, float)
        ac = np.asarray(att_chunk, float)
        rec = {
            "complete": complete,
            "days": days, "nsource": nsource,
            "n_device_lanes": int(n_lanes), "n_shards": nshards,
            "chunk_steps": chunk, "k_buckets": buckets,
            "pin": ([int(pin_env),
                     float(os.environ.get("SKEW_PIN_MWN", "50"))]
                    if pin_env else None),
            # Exact truncation signal: a lane still short of the chunk's
            # final bound after the runner returned means max_iters cut its
            # bucket's while_loop short (dead lanes jump to the final
            # bound, so they never false-positive). This replaces the
            # earlier trip-count>=1e6 heuristic, which with SKEW_BUCKETS>1
            # compared the SUM over a shard's bucket loops against the
            # PER-BUCKET cap and could flag a complete run -- treat
            # truncated chunks' later rows qualitatively.
            "max_iters_truncated": bool(np.asarray(trunc_chunk).any()),
            "per_chunk_truncated_shards": np.asarray(
                trunc_chunk, bool).tolist(),
            "steps_measured": step - 1, "steps_total": nt_m1,
            "per_shard_total_trips": pc.sum(axis=0).tolist(),
            "per_chunk_trips": pc.tolist(),
            "per_shard_total_attempts": ac.sum(axis=0).tolist(),
            "per_chunk_attempts": ac.tolist(),
            # Chunk-level barrier accounting: the chunked driver syncs
            # between chunks, so the honest projection uses the PER-CHUNK
            # max, not the whole-run max (stragglers can sit on different
            # shards in different chunks).
            "skew_trips_chunk_barrier": round(float(
                pc.max(axis=1).sum() / pc.mean(axis=1).sum()), 4),
            "skew_attempts_chunk_barrier": round(float(
                ac.max(axis=1).sum() / ac.mean(axis=1).sum()), 4),
            "projection": ("8-chip wall = single-chip wall * "
                           "skew_chunk_barrier / n_shards"),
            "cpu_walls": [round(w, 1) for w in walls],
        }
        with open(out, "w") as fh:
            json.dump(rec, fh, indent=1)
        return rec

    while step <= nt_m1:
        n = min(chunk, nt_m1 - step + 1)
        bounds = jnp.arange(step, step + n, dtype=dtype) * dt
        t0 = time.perf_counter()
        carry, (_ys, _ugs, _vgs, iters, _nf, la) = (
            tracer._rk45_group_chunk_shardmap(
                mesh, bg, *carry, bounds, cut_off, rtol, atol, min_step,
                prev_att=prev_att, dense=True, k_buckets=buckets,
                **pin_kw))
        it = np.asarray(iters)
        la_h = np.asarray(la)
        prev_att = la  # difficulty feedback, as the chunked driver chains it
        walls.append(time.perf_counter() - t0)
        per_chunk.append(it.tolist())
        att_chunk.append(
            la_h[:per_shard * nshards].reshape(nshards, per_shard)
            .sum(axis=1).tolist())
        t_h = np.asarray(carry[1])[:per_shard * nshards]
        trunc_chunk.append(
            (t_h.reshape(nshards, per_shard) < float(bounds[-1]))
            .any(axis=1).tolist())
        step += n
        _write(False)
        print(f"# chunk [{step - n},{step}) wall={walls[-1]:.1f}s "
              f"shard trips={it.tolist()} "
              f"shard attempts={att_chunk[-1]}", flush=True)

    rec = _write(True)
    print(json.dumps({k: v for k, v in rec.items()
                      if k not in ("per_chunk_trips",
                                   "per_chunk_attempts")}), flush=True)


if __name__ == "__main__":
    main()
