#!/usr/bin/env python3
"""Full-suite decade-sweep analysis (r15 verdict task 4).

Takes two full bench artifacts (the target/bench.json written by
graft.Bench at two scale factors a decade apart), computes the per-query
scaling exponent exp/dec = log10(t_hi / t_lo) / decades, and prints a
markdown table sorted by exponent, flagging everything above the
threshold for adjudication.

Usage:
  python3 tools/decade_sweep.py <bench_lo.json> <bench_hi.json> \
      [--decades 1.0] [--flag 0.5]

Interpretation guide (BASELINE.md round-12+ conventions):
  <=0.0/dec  flat — served store / pushed-scan / dispatch-floor face
  ~0.3/dec  sublinear — partial-agg or pruned-scan face
  ~0.5/dec  keyed-exchange band (shuffle grows with data, 32 fixed threads)
  ~1.0/dec  linear — map-only data-proportional CPU (decode band)
  >1.0/dec  superlinear — ADJUDICATE: a pair join, global sort, or spill
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries", d)
    # full artifact: {"queries": {name: {"wall": s, ...}}} or {name: s}
    out = {}
    for k, v in qs.items():
        out[k] = v.get("wall", v) if isinstance(v, dict) else v
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0][2:]: float(a.split("=")[1])
            for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    decades = opts.get("decades", 1.0)
    flag = opts.get("flag", 0.5)
    lo, hi = load(args[0]), load(args[1])
    names = sorted(set(lo) & set(hi))
    missing = sorted(set(lo) ^ set(hi))
    if missing:
        print(f"<!-- queries in only one artifact: {', '.join(missing)} -->")
    rows = []
    for n in names:
        a, b = lo[n], hi[n]
        if a is None or b is None or a < 0 or b < 0:
            rows.append((float("nan"), n, a, b))
            continue
        # clamp the denominator: sub-50ms walls are timer noise and a
        # ratio over them fabricates wild exponents
        a_eff = max(a, 0.05)
        e = math.log10(max(b, 0.05) / a_eff) / decades
        rows.append((e, n, a, b))
    rows.sort(key=lambda r: (-r[0] if r[0] == r[0] else 99))
    print("| query | lo s | hi s | exp/dec |")
    print("|---|---|---|---|")
    n_flagged = 0
    for e, n, a, b in rows:
        mark = " **FLAG**" if e == e and e > flag else ""
        if mark:
            n_flagged += 1
        es = f"{e:.2f}" if e == e else "err"
        print(f"| {n} | {a:.2f} | {b:.2f} | {es}{mark} |")
    print(f"\n{len(rows)} queries; {n_flagged} above {flag}/dec")


if __name__ == "__main__":
    main()
