#!/usr/bin/env python3
"""Fit per-key scaling exponents from benches at several SFs.

Usage:
  python3 tools/scaling_fit.py SF:FILE SF:FILE SF:FILE [--keys k1,k2]
                               [--markdown]

Each FILE is a graft.Bench log (the LAST {"metric":"total_full",...}
line is used) or a bare JSON object with a "queries" map; SF is the
scale factor it was measured at (0.001, 0.01, 0.1). For every key
present in all files, fits an OLS slope of log10(seconds) vs
log10(SF) — the scaling exponent — plus the LAST-DECADE slope
(largest two SFs only), which is the honest signal once the fixed
per-query overhead (~0.1-0.3 s JVM/planning floor at tiny SF) stops
dominating. A key is flagged SUPERLINEAR when its last-decade slope
is meaningfully above 1 (> 1.15) — those need a re-plan or a
documented bound.

Sub-overhead keys (max time < 0.4 s at the largest SF) are reported
but never flagged: their times are floor, not data work.
"""
import argparse
import json
import math
import re
import sys

FLOOR_S = 0.4
SUPER = 1.15


def load(path):
    txt = open(path).read()
    lines = [l for l in txt.splitlines()
             if l.startswith('{"metric":"total_full"')]
    if lines:
        return json.loads(lines[-1])["queries"]
    return json.loads(txt)["queries"]


def ols_slope(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    return sxy / sxx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+", help="SF:FILE pairs")
    ap.add_argument("--keys", help="comma-separated key filter")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    series = []
    for spec in args.inputs:
        sf, path = spec.split(":", 1)
        series.append((float(sf), load(path)))
    series.sort()
    sfs_in = [sf for sf, _ in series]
    if len(sfs_in) < 2 or len(set(sfs_in)) != len(sfs_in):
        print("need at least two inputs at DISTINCT SFs "
              f"(got {sfs_in})", file=sys.stderr)
        return 2
    common = set(series[0][1])
    for _, q in series[1:]:
        common &= set(q)
    if args.keys:
        common &= set(args.keys.split(","))

    rows = []
    for k in common:
        ts = [(sf, q[k]) for sf, q in series]
        xs = [math.log10(sf) for sf, _ in ts]
        ys = [math.log10(max(t, 1e-3)) for _, t in ts]
        slope = ols_slope(xs, ys)
        (sf_a, t_a), (sf_b, t_b) = ts[-2], ts[-1]
        last = (math.log10(max(t_b, 1e-3)) - math.log10(max(t_a, 1e-3))) \
            / (math.log10(sf_b) - math.log10(sf_a))
        floor = t_b < FLOOR_S
        flag = ("floor" if floor else
                "SUPERLINEAR" if last > SUPER else "ok")
        rows.append((k, [t for _, t in ts], slope, last, flag))
    rows.sort(key=lambda r: -r[1][-1])

    sfs = [sf for sf, _ in series]
    if args.markdown:
        hdr = " | ".join(f"t(sf{sf:g})" for sf in sfs)
        print(f"| key | {hdr} | slope (OLS) | slope (last decade) "
              f"| verdict |")
        print("|---|" + "---|" * (len(sfs) + 3))
        for k, ts, slope, last, flag in rows:
            tcols = " | ".join(f"{t:.2f}" for t in ts)
            print(f"| `{k}` | {tcols} | {slope:.2f} | {last:.2f} "
                  f"| {flag} |")
    else:
        for k, ts, slope, last, flag in rows:
            tcols = " ".join(f"{t:7.2f}" for t in ts)
            print(f"{k:32s} {tcols}  ols={slope:5.2f} "
                  f"last={last:5.2f}  {flag}")
    bad = [k for k, _, _, _, f in rows if f == "SUPERLINEAR"]
    if bad:
        print(f"\nSUPERLINEAR keys: {bad}", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
