#!/usr/bin/env python3
"""Plan-profile regression check: compare a fresh bench_full.json against
the committed PLANS.md and flag queries whose REALIZED plan profile moved
by more than a factor threshold — the diffable form of "did a plan-shape
regression sneak in" (a shuffle that doubled its bytes, a scan that lost
its pushdown and reads 10x the rows).

Timed seconds are deliberately NOT compared (1.5-4x straggler noise on a
shared box — see SCALE.md "Measurement honesty"); scan rows and shuffle
bytes are deterministic realized metrics, so a >2x move there is a plan
change, not noise. n_shuffles gets a +/-1 tolerance: AQE decides at
runtime whether marginal exchanges coalesce or broadcast, so a
single-shuffle delta with stable scan rows and bytes is realization
variance (observed on untouched queries across same-code sweeps), while
a 2+ jump means the plan actually changed shape.

Usage: python3 tools/check_plans.py [bench_full.json] [PLANS.md]
               [--allow-improved]
Exit 1 if any regression is flagged, AND (round-12 advice) if any pin is
IMPROVED: a stale larger pin would silently re-admit a regression back up
to the old level, so shrinkage demands a re-pin (the exact replacement
rows are printed; regenerate with tools/plan_summary.py). Pass
--allow-improved during mid-iteration runs where the re-pin lands with
the final sweep. New/removed queries are reported informationally only.
"""
import json, re, sys

FACTOR = 2.0


def parse_plans(path):
    prof = {}
    for line in open(path):
        m = re.match(r"\| (q_\w+) \| [\d.]+ \| ([\d,—]+) \| ([\d,—]+) "
                     r"\| ([\d,—]+) \|", line)
        if m:
            def num(s):
                return None if s == "—" else int(s.replace(",", ""))
            prof[m.group(1)] = (num(m.group(2)), num(m.group(3)),
                                num(m.group(4)))
    return prof


def main():
    bench = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
    plans = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"
    b = json.load(open(bench))
    fresh = {k: (v.get("scan_rows"), v.get("shuffle_bytes"),
                 v.get("n_shuffles"))
             for k, v in b.get("profiles", {}).items()}
    pinned = parse_plans(plans)
    flagged, improved, new, gone = [], [], [], []
    for name, f in sorted(fresh.items()):
        p = pinned.get(name)
        if p is None:
            new.append(name)
            continue
        for label, i, exact in (("scan_rows", 0, False),
                                ("shuffle_bytes", 1, False),
                                ("n_shuffles", 2, True)):
            a, c = p[i], f[i]
            if a is None or c is None:
                continue
            # direction matters: growth past the gate is a regression;
            # shrinkage past it means the plan got BETTER than its pin —
            # report as IMPROVED and prompt a re-pin, never exit 1
            if exact:
                if c - a > 1:
                    flagged.append((name, label, a, c))
                elif a - c > 1:
                    improved.append((name, label, a, c))
            # small absolute values jitter with AQE coalescing; only
            # compare ratios above a materiality floor
            elif max(a, c) >= 100_000:
                if c > a * FACTOR:
                    flagged.append((name, label, a, c))
                elif a > c * FACTOR:
                    improved.append((name, label, a, c))
    gone = sorted(set(pinned) - set(fresh))
    # a silently-empty gate is worse than a failing one: if the PLANS.md
    # table format drifted (parse found nothing) or nothing overlapped,
    # "0 compared, 0 regressions" must be an ERROR, not a pass
    if not pinned:
        print(f"ERROR: no pinned profiles parsed from {plans} — "
              "table format drift? regenerate with tools/plan_summary.py")
        sys.exit(1)
    if len(fresh) - len(new) == 0:
        print(f"ERROR: 0 queries compared ({len(fresh)} fresh, "
              f"{len(pinned)} pinned, no overlap) — stale inputs?")
        sys.exit(1)
    allow_improved = "--allow-improved" in sys.argv
    for name, label, a, c in flagged:
        print(f"REGRESSION {name}: {label} {a:,} -> {c:,}")
    for name, label, a, c in improved:
        print(f"IMPROVED {name}: {label} {a:,} -> {c:,} "
              "(stale pin — regenerate PLANS.md via tools/plan_summary.py)")
    if improved:
        # exact replacement rows, so the re-pin is copy-pasteable even
        # without a full plan_summary regeneration
        secs = b.get("queries", {})
        print("replacement rows for the improved pins:")
        for name in sorted({n for n, *_ in improved}):
            sr, sb, ns = fresh[name]
            def cell(v):
                return "—" if v is None else f"{v:,}"
            print(f"| {name} | {secs.get(name, 0):.3f} | {cell(sr)} "
                  f"| {cell(sb)} | {cell(ns)} |")
    if new:
        print(f"new (not pinned): {len(new)}: {', '.join(new)}")
    if gone:
        print(f"pinned but absent: {len(gone)}: {', '.join(gone)}")
    if flagged:
        print(f"{len(flagged)} profile regression(s) vs {plans}")
        sys.exit(1)
    if improved and not allow_improved:
        print(f"{len(improved)} IMPROVED pin(s): stale baseline would "
              "re-admit a regression — re-pin PLANS.md (or pass "
              "--allow-improved for a mid-iteration run)")
        sys.exit(1)
    print(f"profiles stable: {len(fresh) - len(new)} compared, "
          f"0 regressions, {len(improved)} improved "
          f"(factor {FACTOR}, n_shuffles +/-1)")


if __name__ == "__main__":
    main()
