#!/usr/bin/env python3
"""Compare the latest full-surface bench sweep at the amplified fixture
against the latest sf0.1 sweep: per-query time ratios vs the data ratio.

Usage: python3 tools/scale_compare.py [--ratio 10] [--flag 4.0]

Reads bench/bench_lines.jsonl (written by graft.Bench). Picks the most
recent line per fixture dir. Queries whose base median is under the
floor (default 0.25 s) are reported in a separate bucket: a sub-noise
base time makes the ratio mostly measurement noise, so those are only
flagged on their ABSOLUTE amplified time.
"""
import argparse
import json

p = argparse.ArgumentParser()
p.add_argument("--lines", default="/root/repo/bench/bench_lines.jsonl")
p.add_argument("--base-sf", default="/root/testdata/sf0.1")
p.add_argument("--amp-sf", default="/root/repo/target/scale10x")
p.add_argument("--ratio", type=float, default=10.0, help="data ratio")
p.add_argument("--flag", type=float, default=4.0,
               help="flag queries whose time ratio exceeds this")
p.add_argument("--floor", type=float, default=0.25,
               help="base seconds below which ratios are noise")
args = p.parse_args()

lines = [json.loads(l) for l in open(args.lines)]
base = [l for l in lines if l.get("sf") == args.base_sf][-1]
amp = [l for l in lines if l.get("sf") == args.amp_sf][-1]

bq, aq = base["queries"], amp["queries"]
names = sorted(set(bq) & set(aq))
missing = sorted(set(bq) ^ set(aq))
if missing:
    print(f"!! not in both sweeps: {missing}")

failed = [n for n in names if aq[n] < 0 or bq[n] < 0]
rows = [(n, bq[n], aq[n], aq[n] / bq[n]) for n in names if n not in failed]
meas = [r for r in rows if r[1] >= args.floor]
tiny = [r for r in rows if r[1] < args.floor]

flagged = sorted([r for r in meas if r[3] > args.flag], key=lambda r: -r[3])
tiny_slow = sorted([r for r in tiny if r[2] > 2.0], key=lambda r: -r[2])

print(f"base total {base['value']}s  amp total {amp['value']}s  "
      f"x{amp['value']/base['value']:.2f} at x{args.ratio:g} data  "
      f"({len(names)} queries, {len(failed)} failed)")
if failed:
    print(f"FAILED at one scale: {failed}")
print(f"\nmeasurable-base queries (base>={args.floor}s): {len(meas)}; "
      f"flagged ratio>{args.flag}: {len(flagged)}")
for n, b, a, r in flagged:
    print(f"  {n:35s} {b:7.3f} -> {a:8.3f}  x{r:.2f}")
print(f"\nsub-noise-base queries with amplified time > 2s: {len(tiny_slow)}")
for n, b, a, r in tiny_slow:
    print(f"  {n:35s} {b:7.3f} -> {a:8.3f}  x{r:.2f}")

meas_sorted = sorted(meas, key=lambda r: -r[3])
print("\ntop-20 ratios (measurable base):")
for n, b, a, r in meas_sorted[:20]:
    print(f"  {n:35s} {b:7.3f} -> {a:8.3f}  x{r:.2f}")
import statistics
print(f"\nmedian ratio (measurable base): "
      f"{statistics.median(r[3] for r in meas):.2f}; "
      f"queries at/below data ratio: "
      f"{sum(1 for r in meas if r[3] <= args.ratio)}/{len(meas)}")
