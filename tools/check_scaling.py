#!/usr/bin/env python3
"""Scaling audit: compare two Bench JSON outputs (e.g. sf0.01 vs sf0.1)
and report per-query wall-clock ratios. With 10x data, a ratio near or
above 10 flags a query whose cost grows superlinearly in practice --
the local early-warning for "would not survive 100x".

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt --batch "runMain graft.Bench /tmp/b_small.json"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1  sbt --batch "runMain graft.Bench /tmp/b_big.json"
  python3 tools/check_scaling.py /tmp/b_small.json /tmp/b_big.json [threshold]
"""
import json
import sys

small_path, big_path = sys.argv[1], sys.argv[2]
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0
MIN_SECS = 0.15  # below this the number is scheduling overhead, not work

small = json.load(open(small_path))["queries"]
big = json.load(open(big_path))["queries"]

rows = sorted(
    ((big[k] / small[k], small[k], big[k], k)
     for k in big if k in small and small[k] > MIN_SECS),
    reverse=True)

bad = [r for r in rows if r[0] >= threshold]
print(f"{'ratio':>6} {'small':>7} {'big':>6}  query")
for r, s, b, k in rows[:20]:
    flag = "  <-- SUPERLINEAR" if r >= threshold else ""
    print(f"{r:6.1f} {s:7.2f} {b:6.2f}  {k}{flag}")
print(f"\n== {len(rows)} compared, {len(bad)} at ratio >= {threshold} ==")
sys.exit(1 if bad else 0)
