#!/usr/bin/env python3
"""Compare two bench_local.json artifacts and flag per-query regressions.

Usage: python3 scripts/benchdiff.py <old.json> <new.json> [threshold]
  threshold: flag queries slower than old * threshold (default 1.5) AND
  by more than 0.2 s absolute (sub-second timings jitter ±15% on a
  shared host — a 0.05 s -> 0.09 s move is noise, not a regression).
  Bench records a failed query as -1.0: a newly-failing query is always
  flagged (exit 1), failed entries never enter ratios or totals. A query
  present in old but missing from new ("GONE") also gates: dropping a
  bench query shrinks the passing total and must be deliberate.
"""
import json
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_doc = json.load(open(old_path))
    new_doc = json.load(open(new_path))
    old, new = old_doc["queries"], new_doc["queries"]
    # median-of-N artifacts carry a per-query spread (max-min over reps);
    # annotate SLOWER rows whose delta sits inside the combined recorded
    # noise floor — still gating (a real regression repeats next run),
    # but the reviewer sees it's within what the host jittered locally
    spread = {**old_doc.get("spread", {}), **{
        q: old_doc.get("spread", {}).get(q, 0.0) + s
        for q, s in new_doc.get("spread", {}).items()}}
    slower, broke = [], []
    for q in sorted(new):
        if new[q] < 0:
            # failing now: newly-broken OR brand-new-and-broken both gate;
            # only still-failing-since-old is informational
            if q in old and old[q] < 0:
                print(f"STILL    {q:<28} (failing in both runs)")
            else:
                broke.append(q)
                was = f"was {old[q]:.2f} s" if q in old else "new query"
                print(f"BROKE    {q:<28} ({was}, now failing)")
        elif q not in old:
            print(f"NEW      {q:<28} {new[q]:6.2f} s")
        elif old[q] < 0:
            print(f"FIXED    {q:<28} {new[q]:6.2f} s (was failing)")
        elif new[q] > old[q] * threshold and new[q] - old[q] > 0.2:
            slower.append((q, old[q], new[q]))
    # a PASSING query dropped from the bench is a coverage regression: it
    # shrinks the passing total and would otherwise slip past the gate.
    # A dropped already-failing query never contributed to that total —
    # removing the dead entry is informational, not gating.
    all_gone = sorted(set(old) - set(new))
    gone = [q for q in all_gone if old[q] >= 0]
    for q in all_gone:
        was = f"was {old[q]:.2f} s" if old[q] >= 0 else "was failing"
        print(f"GONE     {q:<28} ({was})")
    for q, o, n in sorted(slower, key=lambda t: t[1] - t[2]):
        ratio = f"{n / o:.1f}x" if o > 0 else "inf"
        note = "  [within recorded spread]" if n - o <= spread.get(q, 0.0) else ""
        print(f"SLOWER   {q:<28} {o:6.2f} s -> {n:6.2f} s  ({ratio}){note}")
    to = sum(v for v in old.values() if v >= 0)
    tn = sum(v for v in new.values() if v >= 0)
    ratio = f"{tn / to:.2f}x" if to > 0 else "n/a"
    print(f"\ntotal (passing): {to:.1f} s -> {tn:.1f} s ({ratio}), "
          f"{len(slower)} slower, {len(broke)} newly failing, "
          f"{len(gone)} gone")
    sys.exit(1 if slower or broke or gone else 0)


if __name__ == "__main__":
    main()
