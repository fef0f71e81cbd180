#!/usr/bin/env python3
"""Per-key medians over N full-inventory fresh-JVM bench runs.

Usage: bench_medians.py RUN1.json RUN2.json RUN3.json [--keys k1,k2,...]

Each RUN file is the one-line JSON graft.Bench prints. Emits a
markdown table of per-key medians; with --keys, only those keys plus
the total. Implements the BASELINE.md 3-run median protocol (single
runs on this shared machine have ±2x per-key tails).
"""
import json
import statistics
import sys

args = []
keysel = None
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a.startswith("--keys="):
        keysel = a.split("=", 1)[1].split(",")
    elif a == "--keys":  # space-separated form from the usage line
        i += 1
        keysel = argv[i].split(",")
    else:
        args.append(a)
    i += 1

runs = []
for p in args:
    with open(p) as f:
        # tolerate surrounding log noise: take the line with "metric"
        line = next(l for l in f if '"metric"' in l)
        runs.append(json.loads(line))

allkeys = sorted(runs[0]["queries"])
keys = keysel or allkeys
print("| key | " + " | ".join(f"run{i+1}" for i in range(len(runs))) + " | median |")
print("|---|" + "---|" * (len(runs) + 1))
for k in keys:
    if any(k not in r["queries"] for r in runs):
        print(f"| {k} | (absent from at least one run — skipped) |")
        continue
    vals = [r["queries"][k] for r in runs]
    med = statistics.median(vals)
    print(f"| {k} | " + " | ".join(f"{v:.2f}" for v in vals) + f" | {med:.2f} |")
totals = [r["value"] for r in runs]
print(f"| TOTAL | " + " | ".join(f"{v:.1f}" for v in totals) +
      f" | {statistics.median(totals):.1f} |")
