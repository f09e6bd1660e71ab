#!/usr/bin/env python3
"""Round-over-round per-query bench diff (round-9 verdict ask #4; mover
adjudication round-10 ask #3).

Compares two BENCH_LAST.json files (the full per-query map Bench.scala
writes beside the short stdout summary) and reports movers, so a spike in
the driver's sweep is self-adjudicating from git history instead of
needing judge solo-probes.

Usage: python3 tools/bench_diff.py <prev BENCH_LAST.json> <cur BENCH_LAST.json>
       python3 tools/bench_diff.py --git [ref=HEAD~1]   # prev from git
Flags (combine with either form; --git infers the ref automatically):
       --ref <gitref>    round base for touched/untouched labeling
       --probe <sfDir>   solo re-run untouched slower movers via
                         `sbt "runMain graft.Probe suite <sfDir> q,..."`
                         and append the solo numbers to the report
       --json <out>      write the full adjudication table (every mover:
                         prev/cur/ratio, touched/untouched label, solo
                         re-probe time + verdict) as a tracked artifact —
                         the round-12 verdict ask #4: the closing commit
                         carries MOVERS.json so the judge needs zero hand
                         probes. With --json, --probe solo-runs EVERY
                         slower mover (touched included), because the
                         artifact's job is a complete adjudication, not
                         just the subset the label heuristic can't clear.

A query is flagged when best(cur) > FLAG_RATIO * best(prev) AND
best(cur) - best(prev) > FLOOR_SEC (cheap queries never trip on noise).
`best` is min(t, retry) — the same number Bench feeds its total. Entries
present on one side only are listed as added/removed.

Each mover is labeled `touched` (some file changed in the round mentions
the query's name) or `untouched` (no changed src/main file references it
— the sweep delta is host noise until a solo probe says otherwise). The
name-grep is an approximation: a query moved by a change to a shared
operator it calls but never names would read `untouched`; the solo probe
is what settles those, which is why --probe targets exactly that set.
"""
import json
import os
import re
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
    return {k: best(v) for k, v in d.get("queries", {}).items()}


def load_git(ref):
    out = subprocess.run(
        ["git", "show", f"{ref}:BENCH_LAST.json"],
        capture_output=True, text=True)
    if out.returncode != 0:
        sys.exit(f"no BENCH_LAST.json at {ref}: {out.stderr.strip()}")
    return {k: best(v) for k, v in json.loads(out.stdout).get("queries", {}).items()}


def changed_files(ref):
    out = subprocess.run(
        ["git", "diff", "--name-only", f"{ref}..HEAD", "--", "src/main"],
        capture_output=True, text=True)
    return [f for f in out.stdout.splitlines() if f.strip()] \
        if out.returncode == 0 else None


def repo_root():
    out = subprocess.run(["git", "rev-parse", "--show-toplevel"],
                         capture_output=True, text=True)
    return out.stdout.strip() if out.returncode == 0 else None


def touched_by(name, files):
    """True when any round-changed src/main file mentions the query's name
    (full name or its qNN prefix as a word). Paths from `git diff` are
    repo-root-relative, so resolve them against the toplevel — run from
    anywhere else, a cwd-relative open() finds nothing and silently labels
    every mover 'untouched' (ADVICE r11). A file that still can't be read
    (e.g. deleted this round) warns instead of being swallowed."""
    pref = name.split("_")[0]
    pat = re.compile(r"\b(%s|%s)\b" % (re.escape(name), re.escape(pref)))
    root = repo_root()
    for f in files:
        path = os.path.join(root, f) if root else f
        try:
            with open(path, errors="replace") as fh:
                if pat.search(fh.read()):
                    return True
        except OSError as e:
            print(f"  (warn: cannot read changed file {path}: {e}; "
                  f"its queries may be mislabeled untouched)")
            continue
    return False


def solo_probe(names, sf_dir):
    """Run graft.Probe suite over the given queries; returns {name: sec}."""
    cmd = ["sbt", "--error",
           f'runMain graft.Probe suite {sf_dir} {",".join(names)}']
    out = subprocess.run(cmd, capture_output=True, text=True)
    solo = {}
    for m in re.finditer(r"PROBE (\S+): ([0-9.]+) s", out.stdout):
        solo[m.group(1)] = float(m.group(2))
    if not solo:
        print(f"  (solo probe produced no timings; sbt rc={out.returncode})")
    return solo


def main(argv):
    ref = None
    probe_dir = None
    json_out = None
    if "--ref" in argv:
        i = argv.index("--ref")
        ref = argv[i + 1]
        del argv[i:i + 2]
    if "--probe" in argv:
        i = argv.index("--probe")
        probe_dir = argv[i + 1]
        del argv[i:i + 2]
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if argv and argv[0] == "--git":
        gref = argv[1] if len(argv) > 1 else "HEAD~1"
        prev = load_git(gref)
        # resolve the tracked file against the repo root, not the cwd —
        # same trap as touched_by (ADVICE r11)
        root = repo_root()
        cur_path = (os.path.join(root, "BENCH_LAST.json") if root
                    else "BENCH_LAST.json")
        cur = load(cur_path)
        src = f"git:{gref} vs BENCH_LAST.json"
        ref = ref or gref
    elif len(argv) == 2:
        prev = load(argv[0])
        cur_path = argv[1]
        cur = load(cur_path)
        src = f"{argv[0]} vs {argv[1]}"
    else:
        sys.exit(__doc__)

    both = sorted(set(prev) & set(cur))
    added = sorted(set(cur) - set(prev))
    removed = sorted(set(prev) - set(cur))
    # totals over queries valid on BOTH sides only — summing each side's
    # own successes would compare different query sets whenever a query
    # flips fail state (ADVICE r10)
    valid = [k for k in both if prev[k] >= 0 and cur[k] >= 0]
    tp = sum(prev[k] for k in valid)
    tc = sum(cur[k] for k in valid)
    print(f"bench_diff: {src}")
    print(f"shared {len(both)} queries ({len(valid)} valid both sides): "
          f"total {tp:.1f}s -> {tc:.1f}s ({(tc - tp) / tp:+.1%})" if tp
          else "no shared valid queries")
    movers = []
    for k in both:
        p, c = prev[k], cur[k]
        if p < 0 or c < 0:
            # flag only a fail-state CHANGE; failed-both-rounds is not
            # a transition (ADVICE r10)
            if (p < 0) != (c < 0):
                movers.append((float("inf"), k, p, c, "FAIL-STATE CHANGE"))
            continue
        if c > FLAG_RATIO * p and c - p > FLOOR_SEC:
            movers.append((c / max(p, 1e-9), k, p, c, "slower"))
        elif p > FLAG_RATIO * c and p - c > FLOOR_SEC:
            movers.append((c / max(p, 1e-9), k, p, c, "faster"))

    files = changed_files(ref) if ref else None
    labels = {}
    if files is not None:
        for _, k, _, _, _ in movers:
            labels[k] = "touched" if touched_by(k, files) else "untouched"

    for r, k, p, c, tag in sorted(movers, key=lambda m: -m[0]):
        lab = f" [{labels[k]}]" if k in labels else ""
        if tag == "FAIL-STATE CHANGE":
            # the fail sentinel is -1 and the ratio is inf — print the
            # transition, not '-1.00s (infx)' (ADVICE r11)
            ps = "FAIL" if p < 0 else f"{p:.2f}s"
            cs = "FAIL" if c < 0 else f"{c:.2f}s"
            print(f"  {tag} {k}: {ps} -> {cs}{lab}")
        else:
            print(f"  {tag:>7} {k}: {p:.2f}s -> {c:.2f}s ({r:.2f}x){lab}")
    if not movers:
        print(f"  no movers past {FLAG_RATIO}x + {FLOOR_SEC}s")
    if added:
        print(f"  added ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"  removed ({len(removed)}): " + ", ".join(removed))

    solo = {}
    verdicts = {}
    if probe_dir:
        # without --json: adjudicate exactly the set the labels cannot
        # clear (slower without a touched code path). With --json the
        # artifact must be complete, so every slower mover is probed.
        targets = sorted(k for _, k, _, _, tag in movers
                         if tag == "slower" and
                         (json_out or labels.get(k) != "touched"))
        if targets:
            print(f"  solo-probing {len(targets)} slower movers "
                  f"on {probe_dir} ...")
            solo = solo_probe(targets, probe_dir)
            for k in targets:
                s = solo.get(k)
                # both legs of the flagging rule: ratio AND absolute
                # floor — a cheap query's solo wobble is noise by the
                # module's own definition
                verdict = ("noise" if s is not None and
                           (s <= FLAG_RATIO * prev[k] or
                            s - prev[k] <= FLOOR_SEC)
                           else "REGRESSION?" if s is not None else "no timing")
                verdicts[k] = verdict
                ss = f"{s:.2f}s" if s is not None else "-"
                print(f"  solo {k}: sweep {cur[k]:.2f}s, solo {ss}, "
                      f"prev {prev[k]:.2f}s -> {verdict}")
        else:
            print("  no slower movers to probe")

    if json_out:
        table = []
        for r, k, p, c, tag in sorted(movers, key=lambda m: -m[0]):
            row = {"query": k, "tag": tag,
                   "prev_sec": None if p < 0 else round(p, 3),
                   "cur_sec": None if c < 0 else round(c, 3),
                   "ratio": None if not (p >= 0 and c >= 0)
                   else round(r, 3),
                   "label": labels.get(k)}
            if k in solo or k in verdicts:
                row["solo_sec"] = (round(solo[k], 3)
                                   if solo.get(k) is not None else None)
                row["verdict"] = verdicts.get(k)
            table.append(row)
        # stamp the run regime of the `cur` side (r13 verdict ask #4):
        # total_cur_sec is computed from whatever BENCH_LAST.json snapshot
        # this diff read — usually a LOCAL tool run, which the driver's
        # per-round sweep (BENCH_r{N}.json) later re-runs under different
        # host contention; the two totals legitimately disagree, and the
        # artifact should say which regime it diffed.
        import datetime
        run_regime = {
            "cur_file": cur_path,
            "cur_bench_total_sec": None,
            "cur_file_mtime_utc": None,
            "note": "total_cur_sec sums best(t,retry) over the shared-"
                    "valid set from the snapshot named in cur_file (a "
                    "local bench run at diff time); the driver's "
                    "BENCH_r{N}.json sweep is a separate run under "
                    "different contention and need not match this total",
        }
        try:
            with open(cur_path) as fh:
                raw = json.load(fh)
            run_regime["cur_bench_total_sec"] = round(
                float(raw.get("value", -1)), 1)
            run_regime["cur_file_mtime_utc"] = datetime.datetime.fromtimestamp(
                os.path.getmtime(cur_path),
                datetime.timezone.utc).isoformat(timespec="seconds")
        except (OSError, ValueError):
            pass
        doc = {"tool": "tools/bench_diff.py --json", "base": src,
               "run_regime": run_regime,
               "flag_rule": f"best(cur) > {FLAG_RATIO} * best(prev) and "
                            f"delta > {FLOOR_SEC}s",
               "shared": len(both),
               "total_prev_sec": round(tp, 1),
               "total_cur_sec": round(tc, 1),
               "movers": table,
               "added": added, "removed": removed}
        with open(json_out, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")
        print(f"  wrote {json_out}")


if __name__ == "__main__":
    main(sys.argv[1:])
