#!/usr/bin/env python3
"""Fit per-query scaling exponents from two ScaleBench study lines at
different amplification factors (e.g. 10x and 30x).

For each query present in both lines, reports:
  e_full — log-log slope fitted over (1, base), (r1, t1), (r2, t2),
           where each line's own base median anchors the fit (the two
           lines may run in different box-speed epochs, so base times
           are NOT merged);
  e_tail — ln(t2/t1) / ln(r2/r1), the amplified-regime exponent with
           fixed per-query overheads (session bring-up, probe-side
           work, driver latency floors) amortized away. This is the
           number to read: e_tail <= 1 is at-or-below linear.

Usage: python3 tools/scale_exponent.py [--lines bench/scale_lines.jsonl]
"""
import argparse
import json
import math

p = argparse.ArgumentParser()
p.add_argument("--lines", default="/root/repo/bench/scale_lines.jsonl")
args = p.parse_args()

lines = [json.loads(l) for l in open(args.lines)]
by_ratio = {}
for l in lines:
    if l.get("metric") == "scale_study":
        by_ratio[l["data_ratio"]] = l  # latest line per ratio wins
if len(by_ratio) < 2:
    raise SystemExit("need study lines at two data ratios, have: "
                     f"{sorted(by_ratio)}")
r1, r2 = sorted(by_ratio)[-2:]
l1, l2 = by_ratio[r1], by_ratio[r2]
print(f"fitting exponents from x{r1} and x{r2} study lines "
      f"(amplified dirs {l1['amplified']}, {l2['amplified']})\n")

names = sorted(set(l1["queries"]) & set(l2["queries"]))
print(f"{'query':28s} {'base1':>7s} {'t@'+str(r1):>8s} {'base2':>7s} "
      f"{'t@'+str(r2):>8s} {'e_full':>7s} {'e_tail':>7s}")
for n in names:
    q1, q2 = l1["queries"][n], l2["queries"][n]
    b1, t1 = q1["small"], q1["big"]
    b2, t2 = q2["small"], q2["big"]
    # least-squares slope over the three log-log points; the two base
    # measurements both anchor x=1
    xs = [0.0, 0.0, math.log(r1), math.log(r2)]
    ys = [math.log(b1), math.log(b2), math.log(t1), math.log(t2)]
    mx, my = sum(xs) / 4, sum(ys) / 4
    e_full = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
              / sum((x - mx) ** 2 for x in xs))
    e_tail = math.log(t2 / t1) / math.log(r2 / r1)
    flag = "  <-- super-linear tail" if e_tail > 1.15 else ""
    print(f"{n:28s} {b1:7.2f} {t1:8.2f} {b2:7.2f} {t2:8.2f} "
          f"{e_full:7.2f} {e_tail:7.2f}{flag}")
