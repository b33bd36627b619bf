#!/usr/bin/env python3
"""Compare two bench_local.json artifacts and flag per-query regressions.

Usage: python3 scripts/benchdiff.py <old.json> <new.json> [threshold]
  threshold: flag queries slower than old * threshold (default 1.5) AND
  by more than 0.2 s absolute (sub-second timings jitter ±15% on a
  shared host — a 0.05 s -> 0.09 s move is noise, not a regression).
  A failed query is recorded as null (current artifacts) or -1.0
  (legacy): a newly-failing query is always flagged (exit 1), failed
  entries never enter ratios or totals. A query present in old but
  missing from new ("GONE") also gates: dropping a bench query shrinks
  the passing total and must be deliberate. If both artifacts carry
  calibration_s (fixed-spin readings bracketing the run), a blown-out
  calibration is reported so a contended run is visible up front.
"""
import json
import sys


def load(path):
    doc = json.load(open(path))
    # normalize: null (current) and -1.0 (legacy) both mean "failed"
    queries = {q: (-1.0 if v is None else v) for q, v in doc["queries"].items()}
    # per-query noise floor: max-min over the recorded raw reps (current
    # artifacts), falling back to the legacy precomputed "spread" map
    spread = {}
    for q, runs in doc.get("reps_raw", {}).items():
        ok = [r for r in runs if r is not None and r >= 0]
        if len(ok) >= 2:
            spread[q] = max(ok) - min(ok)
    for q, s in doc.get("spread", {}).items():
        spread.setdefault(q, s)
    return doc, queries, spread


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_doc, old, old_spread = load(old_path)
    new_doc, new, new_spread = load(new_path)
    # annotate SLOWER rows whose delta sits inside the combined recorded
    # noise floor — still gating (a real regression repeats next run),
    # but the reviewer sees it's within what the host jittered locally
    spread = {q: old_spread.get(q, 0.0) + new_spread.get(q, 0.0)
              for q in set(old_spread) | set(new_spread)}
    for tag, doc in (("old", old_doc), ("new", new_doc)):
        cal = doc.get("calibration_s")
        if cal:
            print(f"calib    {tag}: before {cal['before']:.3f} s, "
                  f"after {cal['after']:.3f} s (fixed spin; a reading far "
                  "above the idle-host reference means contention)")
        # rep-level outliers (informational, never gating): one rep far
        # above its siblings with a flat GC delta is a host/co-tenant
        # window, not the plan — reps_start_ms pins it to a wall clock
        # so adjacent queries' spikes cluster visibly (round-10 q162's
        # 29.9 s rep 3 needed manual inference; this line automates it)
        for q, runs in sorted(doc.get("reps_raw", {}).items()):
            ok = [r for r in runs if r is not None and r >= 0]
            if len(ok) < 2 or min(ok) <= 0:
                continue
            # rep 1 pays once-per-JVM costs by design (warm_s exists for
            # that); only a spike among the WARM reps indicates a
            # mid-run contention window worth pinning to a wall clock
            warm = [r for r in runs[1:] if r is not None and r >= 0]
            if not warm:
                continue
            worst = max(warm)
            if worst > 2.0 * min(ok) and worst - min(ok) > 0.5:
                i = runs.index(worst)
                off = doc.get("reps_start_ms", {}).get(q)
                at = (f" at t0+{off[i] / 1000.0:.1f}s"
                      if off and i < len(off) else "")
                gc = doc.get("gc_ms", {}).get(q)
                gcs = f", gc {gc} ms over all reps" if gc is not None else ""
                print(f"REPSPIKE {tag} {q:<28} rep {i + 1}/{len(runs)} "
                      f"{worst:.2f} s vs min {min(ok):.2f} s{at}{gcs}")
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
