#!/bin/bash
# Round-5 step 1: drive the committed 30-day dense unpinned record
# (step 263/361 at round-4 close) to complete:true under the round-4
# fingerprint, BEFORE any hot-path edit invalidates it.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/r5_results/bench_d30_unpinned.log
is_done() {
  python3 - <<'PY'
import json, sys
try:
    d = json.load(open(".bench_workdir/done_d30_ns4800_dense.json"))
    sys.exit(0 if d.get("complete") else 1)
except Exception:
    sys.exit(1)
PY
}
for pass in $(seq 1 8); do
  if is_done; then echo "[finish_unpinned] COMPLETE after $((pass-1)) passes" >> "$LOG"; exit 0; fi
  echo "[finish_unpinned] pass $pass $(date -u +%H:%M:%S)" >> "$LOG"
  BENCH_DEADLINE=3000 BENCH_PROBE_TIMEOUT=240 timeout 3300 python bench.py >> "$LOG" 2>&1
  sleep 30
done
is_done && echo "[finish_unpinned] COMPLETE" >> "$LOG" || echo "[finish_unpinned] budget exhausted, still partial" >> "$LOG"
