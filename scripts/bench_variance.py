#!/usr/bin/env python
"""Headline-benchmark variance: N fresh-process bench.py runs.

VERDICT r3 item 7: BENCH_r02/r03, CLAUDE.md and DESIGN.md quoted 72M /
132M / 137M / 142M for the same configuration with no variance estimate,
so a reader could not tell tunnel/clock noise from regression.  This
script runs ``python bench.py`` N times in fresh processes (fresh process
= fresh dispatch path; the persistent compile cache keeps Mosaic compiles
warm so each run measures steady-state throughput), writes every raw line
to ``artifacts/bench_variance_v5e.jsonl``, and prints median / min / max
for the headline metric.  The documented headline number is the MEDIAN of
these runs.

  python scripts/bench_variance.py --runs 5
"""
import argparse
import json
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default="artifacts/bench_variance_v5e.jsonl")
    args = ap.parse_args()

    vals = []
    rows = []
    for i in range(args.runs):
        t0 = time.time()
        proc = subprocess.run([sys.executable, "bench.py"],
                              capture_output=True, text=True, timeout=1800)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")][-1]
        rec = json.loads(line)
        rec["run"] = i
        rec["walltime_s"] = time.time() - t0
        rows.append(rec)
        vals.append(rec["value"])
        print(json.dumps(rec), flush=True)

    vals.sort()
    n = len(vals)
    median = (vals[n // 2] if n % 2 else 0.5 * (vals[n // 2 - 1] + vals[n // 2]))
    summary = {
        "summary": True,
        "runs": n,
        "metric": rows[0]["metric"],
        "median": median,
        "min": vals[0],
        "max": vals[-1],
        "spread_pct": 100.0 * (vals[-1] - vals[0]) / median,
    }
    print(json.dumps(summary), flush=True)
    with open(args.out, "a") as f:
        for r in rows + [summary]:
            f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
