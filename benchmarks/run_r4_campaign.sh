#!/bin/bash
# Round-4 measurement campaign (VERDICT r3 "next round" items 1-3, 7).
#
# Drives the device-measurement backlog SERIALLY (the axon tunnel tolerates
# exactly one JAX client at a time):
#
#   0. straggler probe (characterize pinned lanes; calibrates pin_limit)
#   1. complete the 30-day full-scale DENSE bench under the CURRENT
#      fingerprint (driver-default config: whatever BENCH_PIN_LIMIT default
#      bench.py ships with)
#   2. 30-day DENSE with the straggler pin-kill armed (A/B row; skipped if
#      stage 1 already measured the pinned mode)
#   3. 30-day EXACT (BENCH_DENSE=0 A/B row)
#   4. mixed-precision rate+accuracy probe
#   5. hot-loop decomposition profile
#   6. spectral-vs-gather sampler probe
#   7. 90-day streamed run through trace_rays_chunked(stream_dir=...)
#
# Each stage retries through worker sick windows; bench stages resume from
# the committed workdir records, probes use .ok marker files. Safe to
# re-run at any time.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/r4_results
mkdir -p "$OUT"

log() { echo "[campaign $(date -u +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }

bench_complete() {
  # $1 = done-file key; complete==true? Honors the same BENCH_WORKDIR
  # override bench.py does.
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
    BENCH_DEADLINE=2400 timeout 2600 \
      python3 bench.py >> "$OUT/bench_$key.log" 2>&1
    rc=$?
    if bench_complete "$key"; then log "$key COMPLETE"; return 0; fi
    log "$key not complete yet (bench rc=$rc); cooling 180s"
    sleep 180
  done
  log "$key gave up after $tries attempts"
  return 1
}

run_probe() {
  # $1 = name, $2... = command. Retries through sick windows.
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

# Pin thresholds for the armed A/B row (stage 2). Calibrated from the CPU
# straggler probe (benchmarks/analyze_straggler.py + the per-lane |l|
# histories in straggler_probe_cpu.npz): the real grinders blow the
# attempt budget at |l| ~ 0.4-6.5 — the |l|->infinity critical-layer
# precursor NEVER fires at mwn=50 on this workload — and every lane that
# crossed ~300 attempts/chunk died within 1-2 chunks anyway. So the armed
# row gates on the attempt budget alone (pin_mwn=0 drops the |l| guard entirely: probe runs proved grinders at |l|<1 and even |l|<0.001
# only against exactly-zero-|l| (turning-root) lanes; the m=1.0 probe run proved the grinder holds |l|<1 throughout its 1M-attempt grind), at >3x the
# normal-lane p99.9 (~153).
PIN_LIMIT=${PIN_LIMIT:-500}
PIN_MWN=${PIN_MWN:-0}

log "=== campaign start ==="
# Records first -- they are what the driver's end-of-round bench re-merges;
# probes are confirmatory and run on whatever healthy-worker time remains.
run_bench_until_done d30_ns4800_dense 8
BENCH_PIN_LIMIT=$PIN_LIMIT BENCH_PIN_MWN=$PIN_MWN \
  run_bench_until_done "d30_ns4800_dense_pin${PIN_LIMIT}m${PIN_MWN}" 6
BENCH_DENSE=0 run_bench_until_done d30_ns4800 6
run_probe straggler python3 benchmarks/straggler_probe.py
run_probe mixed_precision python3 benchmarks/mixed_precision_probe.py
run_probe hotpath python3 benchmarks/hotpath_profile.py
run_probe spectral python3 benchmarks/spectral_probe.py
# stream90 exits 3 after each cooperative chunk budget (progress, not
# failure): loop it with a short breather; real failures get the long
# cooldown.
stream90() {
  if [ -f "$OUT/stream90.ok" ]; then log "stream90 already done"; return 0; fi
  local i rc
  for i in $(seq 1 60); do
    log "stream90 attempt $i/60"
    timeout 1800 python3 benchmarks/stream90_probe.py >> "$OUT/stream90.log" 2>&1
    rc=$?
    if [ "$rc" = 0 ]; then touch "$OUT/stream90.ok"; log "stream90 OK"; return 0; fi
    if [ "$rc" = 3 ]; then sleep 20; else log "stream90 rc=$rc; cooling 240s"; sleep 240; fi
  done
  log "stream90 gave up"
  return 1
}
stream90
log "=== campaign end ==="
