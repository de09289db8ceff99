#!/usr/bin/env python3
"""Per-query bench regression check.

Usage: bench_compare.py <old_bench_detail.json> <new_bench_detail.json>
       [--threshold 1.5]

Compares per-query seconds between two bench_detail.json dumps and
prints queries slower than threshold x old (background-load variance on
this box is ~±30%, so the default 1.5x flags real regressions only).
Totals across rounds are NOT comparable (query counts grow; machine
load varies) — this per-query view is the meaningful signal.

Driver-side python — dev tooling only, NOT an engine dependency.
"""
import json
import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a
                        else sys.argv[sys.argv.index(a) + 1])
    old_doc = json.load(open(args[0]))
    new_doc = json.load(open(args[1]))
    # comparing dumps from different scale factors flags everything
    # (or hides everything) — refuse instead of printing nonsense
    if old_doc.get("sf") != new_doc.get("sf"):
        print(f"ABORT: scale factors differ (old sf={old_doc.get('sf')}"
              f", new sf={new_doc.get('sf')}) — not comparable")
        sys.exit(2)
    old, new = old_doc["queries"], new_doc["queries"]
    # subtract each side's fixed harness floor (plan + noop-write of a
    # one-row frame, recorded since r6) so tiny queries compare on
    # engine time, not session overhead. A dump from before floor
    # recording borrows the other side's floor — subtracting from one
    # side only would bias every comparison across that boundary.
    old_floor = old_doc.get("floor_s", new_doc.get("floor_s", 0.0))
    new_floor = new_doc.get("floor_s", old_doc.get("floor_s", 0.0))
    # Box-speed normalization (since r14): each dump carries canary_s,
    # a fixed single-thread CPU loop timed on the same box/run. If both
    # dumps have it, scale the NEW side's engine times by
    # old_canary/new_canary so a uniformly slow box doesn't read as a
    # fleet-wide tree regression (and a fast box doesn't hide one).
    box = 1.0
    if "canary_s" in old_doc and "canary_s" in new_doc \
            and new_doc["canary_s"] > 0:
        box = old_doc["canary_s"] / new_doc["canary_s"]
        print(f"box canary: old {old_doc['canary_s']:.3f}s, "
              f"new {new_doc['canary_s']:.3f}s -> normalizing new times "
              f"by x{box:.3f}")
    regressed, added, removed = [], [], []
    for q, t in sorted(new.items()):
        if q not in old:
            added.append((q, t))
        else:
            o = max(0.001, old[q] - old_floor)
            n = max(0.001, (t - new_floor) * box)
            if n > o * thr and n - o > 0.2:
                regressed.append((q, old[q], t))
    removed = sorted(set(old) - set(new))
    for q, o, n in sorted(regressed, key=lambda x: x[1] - x[2]):
        print(f"REGRESSED {q}: {o:.2f}s -> {n:.2f}s ({n / o:.1f}x)")
    for q, t in added:
        print(f"NEW       {q}: {t:.2f}s")
    for q in removed:
        print(f"REMOVED   {q}")
    both = [q for q in new if q in old]
    tot_old = sum(old[q] for q in both)
    tot_new = sum(new[q] for q in both)
    print(f"\ncommon {len(both)} queries: {tot_old:.1f}s -> {tot_new:.1f}s"
          f" | {len(regressed)} regressed >{thr}x, {len(added)} new,"
          f" {len(removed)} removed")
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
