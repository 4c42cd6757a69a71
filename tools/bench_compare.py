#!/usr/bin/env python3
"""Mechanical bench noise/drift attribution.

Usage:
  python3 tools/bench_compare.py BASE.json NEW.json [--idle IDLE.json]
                                 [--since REV] [--threshold 1.5]

Compares two bench JSONs (driver BENCH_r*.json shape with
parsed.queries, or a raw Bench line with top-level queries). A key is
FLAGGED when its NEW time exceeds `threshold` x its reference time —
the reference is the idle-record JSON when --idle is given, else
BASE. For every flagged key the script locates its defining source
file (the `Q("<key>"` site) and checks whether that file changed
between REV and HEAD (REV defaults to the commit that last touched
BASE.json — i.e. "since the base bench was recorded"):

  - code untouched  -> "noise (code untouched since REV)" — the box's
    documented +/-40% tenancy swing, not a regression;
  - code changed    -> "INVESTIGATE (file changed since REV)".

Exit 0 if nothing needs investigation, 1 otherwise. This replaces the
per-round prose argument with a mechanical call.
"""
import argparse
import glob
import json
import re
import subprocess
import sys


def bench_queries(path):
    b = json.load(open(path))
    if "queries" in b:
        return b["queries"]
    return b["parsed"]["queries"]


def key_files():
    """Map every declared key to the file holding its Q("...") site."""
    out = {}
    for path in glob.glob("src/main/scala/graft/queries/*.scala"):
        for m in re.finditer(r'Q\("([a-z0-9_]+)"', open(path).read()):
            out[m.group(1)] = path
    return out


def git(*args):
    """Run git; return stdout, or None on failure (never mistake a
    failed diff for 'file unchanged')."""
    p = subprocess.run(["git"] + list(args), capture_output=True,
                       text=True)
    if p.returncode != 0:
        print(f"git {' '.join(args)} failed: {p.stderr.strip()}",
              file=sys.stderr)
        return None
    return p.stdout.strip()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("new")
    ap.add_argument("--idle", help="idle-record JSON used as the "
                    "reference medians instead of BASE")
    ap.add_argument("--since", help="rev the 'code changed?' check "
                    "diffs against HEAD (default: last commit touching "
                    "BASE)")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    ref = bench_queries(args.idle or args.base)
    new = bench_queries(args.new)
    since = args.since or git("log", "-1", "--format=%H", "--", args.base)
    files = key_files()

    # A key absent from the reference is only suspicious if its new
    # time would have PLACED in that reference (driver BENCH files
    # are top-20-truncated): below min(USABLE ref) it simply wasn't
    # recorded. Sub-floor entries don't lower the placing bar — a key
    # with a stale 0.04s reference must still surface.
    usable = [v for v in ref.values() if v > 0.05]
    placing = max(1.0, min(usable, default=1.0)) if usable else 1.0
    flagged, investigate, no_ref = [], [], []
    for k, t in sorted(new.items(), key=lambda kv: -kv[1]):
        r = ref.get(k)
        if r is None or r <= 0.05:
            # no usable reference — never drop silently: a new slow
            # key that would have placed in the reference is exactly
            # what this tool exists to surface
            if t > placing:
                no_ref.append((k, t, r))
                investigate.append(k)
            continue
        if t <= args.threshold * r:
            continue
        f = files.get(k)
        if f and since:
            d = git("diff", "--name-only", f"{since}..HEAD", "--", f)
            changed = None if d is None else bool(d)
        else:
            changed = None
        flagged.append((k, t, r, f, changed))
        if changed is not False:
            investigate.append(k)

    total_new = sum(new.values())
    total_ref = sum(ref.get(k, 0) for k in new)
    print(f"total: {total_new:.1f}s new vs {total_ref:.1f}s reference "
          f"({len(new)} keys, threshold {args.threshold}x, "
          f"since {since[:12] if since else '?'})")
    for k, t, r in no_ref:
        print(f"  {k}: no usable reference "
              f"({'absent' if r is None else f'{r:.2f}s <= floor'}) "
              f"-> {t:.2f}s  INVESTIGATE (new or blown-past-floor key)")
    if not flagged and not no_ref:
        print("no key above threshold — clean")
        return 0
    for k, t, r, f, changed in flagged:
        verdict = ("INVESTIGATE (file changed since rev)"
                   if changed else
                   "noise (code untouched since rev)"
                   if changed is False else
                   "INVESTIGATE (git check failed or no source site)")
        print(f"  {k}: {r:.2f}s -> {t:.2f}s ({t/r:.2f}x)  [{f}]  "
              f"{verdict}")
    return 1 if investigate else 0


if __name__ == "__main__":
    sys.exit(main())
