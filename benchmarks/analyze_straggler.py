"""Digest a straggler_probe npz into pin_limit/pin_mwn calibration.

Answers, from per-chunk per-lane (attempts, h, |l|, alive) records:
  1. the attempt distribution of NORMAL lanes per chunk (sets the safety
     margin under pin_limit);
  2. which lanes blow a candidate attempt budget, their |l| there, and
     their eventual fate in the baseline run (die vs survive) -- the
     would-die-anyway evidence for the |l|-gated retirement;
  3. lane-iteration units the pin would have saved per chunk (the peel
     units are trip x width, so the saving estimate is conservative:
     retired-lane attempts above the budget, times the narrow-leg width).

Usage: python benchmarks/analyze_straggler.py [path.npz]
       (default benchmarks/r4_results/straggler_probe_cpu.npz)
"""

import json
import os
import sys

import numpy as np


def main():
    path = (sys.argv[1] if len(sys.argv) > 1 else
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "r4_results", "straggler_probe_cpu.npz"))
    d = np.load(path)
    att = d["att"]        # (C, R) attempts within each chunk
    lam = np.abs(d["l"])  # (C, R) |l| at chunk end
    alive = d["alive"]    # (C, R)
    n_chunks, n_lanes = att.shape

    print(f"# {path}: {n_chunks} chunks x {n_lanes} lanes, "
          f"walls={[round(float(w), 1) for w in d['walls']]}")
    out = {"chunks": n_chunks, "lanes": int(n_lanes)}

    rows = []
    for c in range(n_chunks):
        a = att[c]
        rows.append({
            "chunk": c,
            "p50": float(np.percentile(a, 50)),
            "p99": float(np.percentile(a, 99)),
            "p999": float(np.percentile(a, 99.9)),
            "max": int(a.max()),
            "dead": int((~alive[c]).sum()),
        })
    out["attempts_per_chunk"] = rows
    for r in rows:
        print(f"# chunk {r['chunk']}: p50={r['p50']:.0f} p99={r['p99']:.0f} "
              f"p99.9={r['p999']:.0f} max={r['max']} dead={r['dead']}")

    # Candidate budgets: from 2x the global p99.9 upward.
    p999 = max(r["p999"] for r in rows)
    budgets = sorted({int(b) for b in (2 * p999, 500, 1000, 2000, 4000)})
    cand = []
    for budget in budgets:
        blown = att >= budget                      # (C, R)
        lanes = np.where(blown.any(axis=0))[0]
        if not len(lanes):
            cand.append({"pin_limit": budget, "lanes_blown": 0})
            continue
        first_chunk = blown[:, lanes].argmax(axis=0)
        lam_at = lam[first_chunk, lanes]
        died = ~alive[-1, lanes]
        # units saved: attempts above budget in blown chunks (conservative:
        # counts only the blown lanes' own narrow-leg trips).
        saved = int(np.maximum(att - budget, 0)[blown.any(axis=0)[None, :]
                                                & blown].sum())
        cand.append({
            "pin_limit": budget,
            "lanes_blown": int(len(lanes)),
            "lam_at_blow_p10": round(float(np.percentile(lam_at, 10)), 1),
            "lam_at_blow_med": round(float(np.median(lam_at)), 1),
            "lam_at_blow_max": round(float(lam_at.max()), 1),
            "blown_died_by_end": int(died.sum()),
            "blown_survived": int((~died).sum()),
            "attempts_saved_above_budget": saved,
        })
    out["candidates"] = cand
    for c in cand:
        print("#", c)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
