#!/usr/bin/env python3
"""Tabulate the shuffle-bytes decade from two Bench artifacts.

Reproduces SCALING.md's "Shuffle-bytes decade" section:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_BENCH_OUT=/tmp/a.json java ... graft.Bench
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1  SPARK_GRAFT_BENCH_OUT=/tmp/b.json java ... graft.Bench
  python3 tools/shuffle_scaling.py /tmp/a.json /tmp/b.json

Prints pack totals, the bounded-growth count, and the largest shuffles
with their decade ratios.
"""
import json, sys

def load(p):
    d = json.loads(open(p).readline())
    return ({k: v["shuffle_bytes"] for k, v in d["queries"].items()},
            d["shuffle_bytes"])

a, ta = load(sys.argv[1])
b, tb = load(sys.argv[2])
print(f"pack totals: {ta/1e6:.1f} MB -> {tb/1e6:.1f} MB "
      f"({tb/max(ta,1):.1f}x per 10x data)")
rows = []
for k in sorted(set(a) & set(b)):
    r = b[k] / a[k] if a[k] > 0 else float("inf")
    rows.append((k, a[k], b[k], r))
bounded = sum(1 for _, _, y, r in rows if y == 0 or r < 3)
print(f"bounded (<3x growth): {bounded} of {len(rows)} queries\n")
print("| query | small KB | big KB | ratio |")
print("|---|---|---|---|")
for k, x, y, r in sorted(rows, key=lambda t: -t[2])[:20]:
    print(f"| {k} | {x/1000:.0f} | {y/1000:.0f} | {r:.1f}x |")
