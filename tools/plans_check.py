#!/usr/bin/env python3
"""Assert PLANS.md covers every bench-top-20 key.

Usage: python3 tools/plans_check.py [BENCH_rNN.json ...]

With no args, uses the highest-numbered BENCH_r*.json in the repo
root. Reads the per-query seconds (top-level "queries" or
"parsed.queries"), takes the 20 slowest keys, and exits 1 listing any
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
        top = sorted(bench_queries(path).items(), key=lambda kv: -kv[1])[:20]
        missing = [k for k, _ in top if k not in plans]
        if missing:
            rc = 1
            print(f"{path}: top-20 keys MISSING from PLANS.md: {missing}")
        else:
            print(f"{path}: top-20 plan coverage 20/20")
    return rc


if __name__ == "__main__":
    sys.exit(main())
