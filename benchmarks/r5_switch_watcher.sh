#!/bin/bash
# Round-5 session watcher: let the RUNNING campaign (run_r5_campaign.sh,
# PID in /tmp/campaign.pid) finish its mixed_precision + hotpath probe
# stages, then stop it BEFORE its stream90 stage (which would run the
# 90-day workload unpinned -- uncompletable past the day-21.9 grinder on
# this worker, MEASUREMENTS.md round-5 headline) and hand off to
# run_r5_campaign_v2.sh (stream90 pinned at production thresholds,
# spectral before the leftover A/B window, stale exact record dropped).
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/r5_results
CPID=$(cat /tmp/campaign.pid)

while kill -0 "$CPID" 2>/dev/null && [ ! -f "$OUT/hotpath.ok" ]; do
  sleep 20
done

if kill -0 "$CPID" 2>/dev/null; then
  # Kill the campaign shell and its descendants by explicit PID walk
  # (children/grandchildren via --ppid; never by name pattern).
  CH=$(ps -o pid= --ppid "$CPID")
  kill "$CPID" 2>/dev/null
  for p in $CH; do
    GCH=$(ps -o pid= --ppid "$p" 2>/dev/null)
    kill "$p" 2>/dev/null
    for g in $GCH; do kill "$g" 2>/dev/null; done
  done
  sleep 8
fi
# If an unpinned stream90 attempt got a head start, drop its state so the
# pinned run starts clean (no mixed-mode resume).
rm -rf "$OUT/stream90_work"
rm -f "$OUT/stream90.log" "$OUT/stream90.ok"

nohup bash benchmarks/run_r5_campaign_v2.sh >> "$OUT/campaign_outer.log" 2>&1 &
echo $! > /tmp/campaign.pid
echo "switched to v2 (campaign pid $(cat /tmp/campaign.pid))"
