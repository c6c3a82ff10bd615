#!/bin/bash
# Round-3 measurement campaign (VERDICT r2 "next round" items 1-5).
#
# Drives the full device-measurement backlog SERIALLY (the axon tunnel
# tolerates exactly one JAX client at a time -- see MEASUREMENTS.md):
#
#   1. complete the 30-day full-scale DENSE bench (resumes workdir spans)
#   2. measure the 30-day full-scale EXACT bench (BENCH_DENSE=0 A/B row)
#   3. mixed-precision rate+accuracy probe
#   4. hot-loop decomposition profile
#   5. spectral-vs-gather sampler probe
#
# Each stage retries through worker sick windows (bench.py has its own
# probe/cooldown ladder; the probes get simple retry loops). All output
# lands in benchmarks/r3_results/. Safe to re-run: completed bench configs
# re-merge instantly from the workdir; completed probe stages are skipped
# via their .ok marker files.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/r3_results
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
  # $1 = key, $2 = BENCH_DENSE value, $3 = max attempts
  local key=$1 dense=$2 tries=$3 i
  for i in $(seq 1 "$tries"); do
    if bench_complete "$key"; then log "$key already complete"; return 0; fi
    log "bench $key attempt $i/$tries"
    BENCH_DENSE=$dense BENCH_DEADLINE=2400 timeout 2500 \
      python3 bench.py >> "$OUT/bench_$key.log" 2>&1
    local rc=$?
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

log "=== campaign start ==="
run_bench_until_done d30_ns4800_dense 1 6
run_bench_until_done d30_ns4800 0 6
run_probe mixed_precision python3 benchmarks/mixed_precision_probe.py
run_probe hotpath python3 benchmarks/hotpath_profile.py
run_probe spectral python3 benchmarks/spectral_probe.py
log "=== campaign end ==="
