#!/usr/bin/env python3
"""Round-over-round per-query bench diff (round-9 verdict ask #4).

Compares two BENCH_LAST.json files (the full per-query map Bench.scala
writes beside the short stdout summary) and reports movers, so a spike in
the driver's sweep is self-adjudicating from git history instead of
needing judge solo-probes.

Usage: python3 tools/bench_diff.py <prev BENCH_LAST.json> <cur BENCH_LAST.json>
       python3 tools/bench_diff.py --git [ref=HEAD~1]   # prev from git

A query is flagged when best(cur) > FLAG_RATIO * best(prev) AND
best(cur) - best(prev) > FLOOR_SEC (cheap queries never trip on noise).
`best` is min(t, retry) — the same number Bench feeds its total. Entries
present on one side only are listed as added/removed.
"""
import json
import subprocess
import sys

FLAG_RATIO = 1.5
FLOOR_SEC = 0.75


def best(v):
    if isinstance(v, dict):
        ts = [t for t in (v.get("t"), v.get("retry")) if t is not None and t >= 0]
        return min(ts) if ts else -1.0
    return v


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: best(v) for k, v in d.get("queries", {}).items()}, d


def load_git(ref):
    out = subprocess.run(
        ["git", "show", f"{ref}:BENCH_LAST.json"],
        capture_output=True, text=True)
    if out.returncode != 0:
        sys.exit(f"no BENCH_LAST.json at {ref}: {out.stderr.strip()}")
    d = json.loads(out.stdout)
    return {k: best(v) for k, v in d.get("queries", {}).items()}, d


def main(argv):
    if argv and argv[0] == "--git":
        ref = argv[1] if len(argv) > 1 else "HEAD~1"
        prev, _ = load_git(ref)
        cur, curd = load("BENCH_LAST.json")
        src = f"git:{ref} vs BENCH_LAST.json"
    elif len(argv) == 2:
        prev, _ = load(argv[0])
        cur, curd = load(argv[1])
        src = f"{argv[0]} vs {argv[1]}"
    else:
        sys.exit(__doc__)

    both = sorted(set(prev) & set(cur))
    added = sorted(set(cur) - set(prev))
    removed = sorted(set(prev) - set(cur))
    tp = sum(v for v in (prev[k] for k in both) if v >= 0)
    tc = sum(v for v in (cur[k] for k in both) if v >= 0)
    print(f"bench_diff: {src}")
    print(f"shared {len(both)} queries: total {tp:.1f}s -> {tc:.1f}s "
          f"({(tc - tp) / tp:+.1%})" if tp else "no shared queries")
    movers = []
    for k in both:
        p, c = prev[k], cur[k]
        if p < 0 or c < 0:
            if p < 0 or c < 0:
                movers.append((float("inf"), k, p, c, "FAIL-STATE CHANGE"))
            continue
        if c > FLAG_RATIO * p and c - p > FLOOR_SEC:
            movers.append((c / max(p, 1e-9), k, p, c, "slower"))
        elif p > FLAG_RATIO * c and p - c > FLOOR_SEC:
            movers.append((c / max(p, 1e-9), k, p, c, "faster"))
    for r, k, p, c, tag in sorted(movers, key=lambda m: -m[0]):
        print(f"  {tag:>7} {k}: {p:.2f}s -> {c:.2f}s ({r:.2f}x)")
    if not movers:
        print(f"  no movers past {FLAG_RATIO}x + {FLOOR_SEC}s")
    if added:
        print(f"  added ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"  removed ({len(removed)}): " + ", ".join(removed))


if __name__ == "__main__":
    main(sys.argv[1:])
