#!/bin/bash
# Round-5 measurement campaign (VERDICT r4 "next round" items 1-9).
#
# Runs AFTER the round-5 hot-path commits (grinder-kill predicate +
# truncation surfacing) land, i.e. under the round-5 fingerprint. Serial
# device backlog (the axon tunnel tolerates exactly one JAX client):
#
#   1. 30-day full-scale DENSE bench, unpinned (the driver-default config
#      the end-of-round bench re-merges) -- VERDICT item 1
#   2. 30-day DENSE with the straggler pin-kill armed at the production
#      thresholds (attempts-only, pin500m0) -- A/B row
#   3. 30-day EXACT (BENCH_DENSE=0 A/B row) -- deferred-probe item 9
#   4. mixed-precision rate+accuracy probe (VERDICT item 4)
#   5. hot-loop decomposition profile (feeds the roofline paragraph,
#      VERDICT item 8)
#   6. spectral-vs-gather sampler probe
#   7. 90-day streamed run through trace_rays_chunked(stream_dir=...)
#      (VERDICT item 6)
#
# Each stage retries through worker sick windows; bench stages resume from
# the committed workdir records, probes use .ok marker files in
# benchmarks/r5_results. Safe to re-run at any time.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/r5_results
mkdir -p "$OUT"
export PROBE_RESULTS=r5_results
export PROBE_ORACLE_PATH=${PROBE_ORACLE_PATH:-$OUT/mp_oracle.npz}

log() { echo "[campaign $(date -u +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }

bench_complete() {
  python3 - "$1" <<'EOF'
import json, os, sys
workdir = os.environ.get("BENCH_WORKDIR", ".bench_workdir")
try:
    d = json.load(open(os.path.join(workdir, f"done_{sys.argv[1]}.json")))
    sys.exit(0 if d.get("complete") else 1)
except Exception:
    sys.exit(1)
EOF
}

run_bench_until_done() {
  # $1 = key, $2 = max attempts; extra env comes from the caller's exports.
  local key=$1 tries=$2 i rc
  for i in $(seq 1 "$tries"); do
    if bench_complete "$key"; then log "$key already complete"; return 0; fi
    log "bench $key attempt $i/$tries"
    BENCH_DEADLINE=2400 BENCH_PROBE_TIMEOUT=240 timeout 2600 \
      python3 bench.py >> "$OUT/bench_$key.log" 2>&1
    rc=$?
    if bench_complete "$key"; then log "$key COMPLETE"; return 0; fi
    log "$key not complete yet (bench rc=$rc); cooling 120s"
    sleep 120
  done
  log "$key gave up after $tries attempts"
  return 1
}

run_probe() {
  local name=$1; shift
  if [ -f "$OUT/$name.ok" ]; then log "$name already done"; return 0; fi
  local i
  for i in 1 2 3 4; do
    log "probe $name attempt $i/4"
    if timeout 1800 "$@" > "$OUT/$name.log" 2>&1; then
      touch "$OUT/$name.ok"; log "$name OK"; return 0
    fi
    log "$name failed (rc=$?); cooling 240s"
    sleep 240
  done
  log "$name gave up"
  return 1
}

# Production pin thresholds (attempts-only gating; DESIGN.md section 6g
# round-4/5 calibration, RunConfig accepts pin_mwn=0 since round 5).
PIN_LIMIT=${PIN_LIMIT:-500}
PIN_MWN=${PIN_MWN:-0}

log "=== r5 campaign start (fingerprint $(python3 - <<'EOF'
import hashlib, os
hsh = hashlib.sha256()
for rel in ["tracer.py", "constants.py", "ops/interp.py", "ops/cubic.py",
            "ops/groupvel.py", "ops/grid.py", "models/ray.py",
            "models/basic_state.py", "solvers/rk45.py", "solvers/rk4.py"]:
    p = os.path.join("rwrt_tpu", rel)
    if os.path.exists(p):
        hsh.update(open(p, "rb").read())
print(hsh.hexdigest()[:16])
EOF
)) ==="
# Priority order (VERDICT r4): the PINNED record first -- it is the bench
# default since round 5 (the unpinned run cannot cross the day-21.9
# perpetual-rejection grinder on this worker; bench.py _pin_env_resolved)
# -- then the unpinned A/B (expected deep-partial), then the item-4/6/8
# probes, the exact A/B and spectral probe last (item 9, droppable).
run_bench_until_done "d30_ns4800_dense_pin${PIN_LIMIT}m${PIN_MWN}" 10
JAX_ENABLE_X64=1 run_probe mixed_precision python3 benchmarks/mixed_precision_probe.py
run_probe hotpath python3 benchmarks/hotpath_profile.py
# stream90 exits 3 after each cooperative chunk budget (progress, not
# failure): loop it with a short breather; real failures get the long
# cooldown. Runs PINNED at the production thresholds: the 90-day horizon
# crosses the day-21.9 perpetual-rejection grinder (MEASUREMENTS.md
# round-5 headline), which no unpinned mode can pass on this worker --
# the stream90.json row names its pin mode.
stream90() {
  if [ -f "$OUT/stream90.ok" ]; then log "stream90 already done"; return 0; fi
  local i rc
  for i in $(seq 1 90); do
    log "stream90 attempt $i/90 (pin${PIN_LIMIT}m${PIN_MWN})"
    BENCH_PIN_LIMIT=$PIN_LIMIT BENCH_PIN_MWN=$PIN_MWN \
      timeout 1800 python3 benchmarks/stream90_probe.py >> "$OUT/stream90.log" 2>&1
    rc=$?
    if [ "$rc" = 0 ]; then touch "$OUT/stream90.ok"; log "stream90 OK"; return 0; fi
    if [ "$rc" = 3 ]; then sleep 15; else log "stream90 rc=$rc; cooling 240s"; sleep 240; fi
  done
  log "stream90 gave up"
  return 1
}
stream90
run_probe spectral python3 benchmarks/spectral_probe.py
# A/B rows last: expected DEEP PARTIALS -- the day-21.9
# perpetual-rejection grinder hangs the worker in any unpinned mode
# (MEASUREMENTS.md round-5 headline); the unpinned covered-span rate is
# already banked at steps 1-262 under the round-5 fingerprint, so it gets
# one leftover window only. The exact-mode record predates the round-5
# fingerprint (would restart from step 1) -- dropped per VERDICT item 9.
BENCH_PIN_LIMIT= run_bench_until_done d30_ns4800_dense 1
log "=== r5 campaign end ==="
