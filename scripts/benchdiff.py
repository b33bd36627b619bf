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
        # per-rep host-load probes (round-12): each rep is preceded by a
        # short fixed spin; a probe far above the run's own minimum marks
        # that rep as contended, independent of what the query itself
        # read. Band: >1.5x the run reference AND >50 ms absolute.
        probe_ref = doc.get("probe_ref_s")
        probes = doc.get("probe_s", {})
        if probe_ref:
            hot = []
            for q, ps in probes.items():
                for i, p in enumerate(ps):
                    if p is not None and p > 1.5 * probe_ref and p - probe_ref > 0.05:
                        hot.append((q, i, p))
            if hot:
                print(f"LOADPROBE {tag}: {len(hot)} contended rep(s) "
                      f"(probe ref {probe_ref * 1000:.0f} ms):")
                for q, i, p in sorted(hot, key=lambda t: -t[2])[:20]:
                    print(f"  {q:<28} rep {i + 1} probe "
                          f"{p * 1000:.0f} ms ({p / probe_ref:.1f}x ref)")
        # I/O-side probe (round-13): a timed ~8 MB page-cache read before
        # each rep. The round-12 burst was invisible to the CPU spin
        # probe (1.0-1.6x) while reps swung 13x — it was I/O/memory-side.
        # Band: >3x the run reference AND >20 ms absolute (page-cache
        # reads jitter more than ALU spins; an evicted-cache or
        # saturated-storage read blows past both).
        io_ref = doc.get("io_probe_ref_s")
        io_probes = doc.get("io_probe_s", {})
        if io_ref:
            hot = []
            for q, ps in io_probes.items():
                for i, p in enumerate(ps):
                    if p is not None and p > 3.0 * io_ref and p - io_ref > 0.02:
                        hot.append((q, i, p))
            if hot:
                print(f"IOPROBE  {tag}: {len(hot)} I/O-contended rep(s) "
                      f"(io ref {io_ref * 1000:.1f} ms):")
                for q, i, p in sorted(hot, key=lambda t: -t[2])[:20]:
                    print(f"  {q:<28} rep {i + 1} io-probe "
                          f"{p * 1000:.0f} ms ({p / io_ref:.1f}x ref)")
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
                # index within the WARM slice, offset by 1 for the cold
                # rep — runs.index(worst) would mis-attribute the spike
                # to rep 1 whenever the cold rep happens to equal the
                # worst warm value (ADVICE r11)
                i = next((j + 1 for j, r in enumerate(runs[1:])
                          if r is not None and r == worst), None)
                if i is None:
                    continue
                off = doc.get("reps_start_ms", {}).get(q)
                at = (f" at t0+{off[i] / 1000.0:.1f}s"
                      if off and i < len(off) else "")
                gc = doc.get("gc_ms", {}).get(q)
                gcs = f", gc {gc} ms over all reps" if gc is not None else ""
                ps = probes.get(q)
                pr = (f", probe {ps[i] * 1000:.0f} ms"
                      if ps and i < len(ps) and ps[i] is not None else "")
                ios = doc.get("io_probe_s", {}).get(q)
                ior = (f", io-probe {ios[i] * 1000:.0f} ms"
                       if ios and i < len(ios) and ios[i] is not None else "")
                print(f"REPSPIKE {tag} {q:<28} rep {i + 1}/{len(runs)} "
                      f"{worst:.2f} s vs min {min(ok):.2f} s{at}{gcs}{pr}{ior}")
    # min-of-reps per query (contention only ever ADDS time, so the min
    # is the plan-cost estimate robust to a burst that swallows a whole
    # median-of-3 window — round-11 verdict item)
    def rep_mins(doc):
        out = {}
        for q, runs in doc.get("reps_raw", {}).items():
            ok = [r for r in runs if r is not None and r >= 0]
            if ok:
                out[q] = min(ok)
        return out
    old_min, new_min = rep_mins(old_doc), rep_mins(new_doc)
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
        # medians regressed but the new MIN rep still sits inside the
        # threshold of the old median: the plan did not get slower —
        # some reps were contended (cross-check LOADPROBE/REPSPIKE)
        nm = new_min.get(q)
        if not note and nm is not None and \
                (nm <= o * threshold or nm - o <= 0.2):
            note = f"  [min-of-reps {nm:.2f} s — likely contention]"
        print(f"SLOWER   {q:<28} {o:6.2f} s -> {n:6.2f} s  ({ratio}){note}")
    to = sum(v for v in old.values() if v >= 0)
    tn = sum(v for v in new.values() if v >= 0)
    ratio = f"{tn / to:.2f}x" if to > 0 else "n/a"
    tom = sum(old_min.get(q, 0.0) for q in old if old[q] >= 0)
    tnm = sum(new_min.get(q, 0.0) for q in new if new[q] >= 0)
    mins_note = (f"; min-of-reps {tom:.1f} s -> {tnm:.1f} s"
                 if old_min and new_min else "")
    print(f"\ntotal (passing): {to:.1f} s -> {tn:.1f} s ({ratio}), "
          f"{len(slower)} slower, {len(broke)} newly failing, "
          f"{len(gone)} gone{mins_note}")
    sys.exit(1 if slower or broke or gone else 0)


if __name__ == "__main__":
    main()
