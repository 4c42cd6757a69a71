#!/usr/bin/env python3
"""Assert PLANS.md covers every bench-top-20 key, with a 25% bubble.

Usage: python3 tools/plans_check.py [BENCH_rNN.json ...]

With no args, uses the highest-numbered BENCH_r*.json in the repo
root AND every same-round close record. Reads the per-query seconds
(top-level "queries" or "parsed.queries"), takes the 20 slowest keys
PLUS every key within 25% of the 20th-slowest time (the bubble — r13
lesson: fn_collate sat just below the close-record cutoff, then
official-window tenancy drift promoted it into the official top-20
after close, reddening the gate). Exits 1 listing any bubble key
without a `## <key>` section in PLANS.md — the machine check behind
the README's "bench top-20 plan coverage" claim.
"""
import glob
import json
import re
import sys


def bench_queries(path):
    b = json.load(open(path))
    if "queries" in b:
        return b["queries"]
    return b["parsed"]["queries"]


def main():
    # numeric round sort — lexicographic picks r99 over r100. With no
    # args, check BOTH the driver's newest official BENCH_rN AND the
    # builder's newest close record (r11 lesson: mmr was top-20 in the
    # driver window but not the close record, so checking only one
    # left the official gate red).
    paths = sys.argv[1:]
    if not paths:
        for pat in ("BENCH_r*.json", "bench_records/bench_r*close*.json"):
            cand = [p for p in glob.glob(pat) if re.search(r"r(\d+)", p)]
            if not cand:
                continue
            top = max(int(re.search(r"r(\d+)", p).group(1)) for p in cand)
            # ALL records of the newest round, in deterministic name
            # order — two same-round close records (e.g. local[4] and
            # local[32]) must BOTH be gated, not whichever globs last
            paths += sorted(
                p for p in cand
                if int(re.search(r"r(\d+)", p).group(1)) == top)
    if not paths:
        print("no BENCH_r*.json found", file=sys.stderr)
        return 2
    plans = set(re.findall(r"^## (\S+)", open("PLANS.md").read(), re.M))
    rc = 0
    for path in paths:
        ranked = sorted(bench_queries(path).items(), key=lambda kv: -kv[1])
        cutoff = ranked[min(19, len(ranked) - 1)][1]
        # 25% bubble: any key within 25% of the top-20 cutoff must be
        # covered too, so post-close tenancy drift can't promote an
        # unplanned key into the official top-20
        bubble = [k for k, v in ranked if v >= 0.75 * cutoff]
        missing = [k for k in bubble if k not in plans]
        if missing:
            rc = 1
            print(f"{path}: bubble keys (>=75% of top-20 cutoff "
                  f"{cutoff:.3f}s) MISSING from PLANS.md: {missing}")
        else:
            print(f"{path}: plan coverage {len(bubble)}/{len(bubble)} "
                  f"(top-20 + 25% bubble, cutoff {cutoff:.3f}s)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
