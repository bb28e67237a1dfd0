#!/usr/bin/env python3
"""Scale-sweep regression gate (dev tooling): diff two SCALE artifacts
on ABSOLUTE per-query wall seconds at each shared factor and FAIL
(exit 1) when a query got more than `threshold`x slower at the same
factor — the 32x sweep twin of compare_streambench.py (r15 verdict
task 2: the sweep is the main scale evidence; this makes it a gate.
Run retroactively, it flags the one genuine r15 sweep regression —
ann_lsh 1.86 -> 4.65 s at 32x, the priced recall trade).

Usage: python3 dev/compare_scale.py OLD.json NEW.json [threshold]
Default threshold 2.0 on ABSOLUTE seconds per (query, factor) — the
1x/32x RATIO is deliberately not gated: it punishes making the 1x
denominator faster (exactly the r15 aggregate-ratio artifact).
Sub-second rows are exempted via an absolute floor (old AND new
< 1.0 s never fails — the committed artifacts show sub-second rows
jitter up to ~1.6x on a shared host).

Queries present only in NEW are reported, never fail (rosters widen);
a query that VANISHED from the roster fails, and so does a (query,
factor) sample present in OLD but missing from NEW — scale evidence
must not silently narrow at either granularity.
"""
import sys, json

old_p, new_p = sys.argv[1], sys.argv[2]
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
FLOOR_SEC = 1.0
old, new = json.load(open(old_p)), json.load(open(new_p))

fails = []
for q, facs in sorted(old["queries"].items()):
    if q not in new["queries"]:
        fails.append(f"{q}: present in {old_p} but MISSING from {new_p}")
        continue
    for fac, old_s in sorted(facs.items(), key=lambda kv: int(kv[0])):
        new_s = new["queries"][q].get(fac)
        if new_s is None:
            fails.append(f"{q}@{fac}x: sample present in {old_p} but MISSING "
                         f"from {new_p} (old {old_s:.2f} s)")
            continue
        ratio = new_s / old_s if old_s else float("inf")
        noise = old_s < FLOOR_SEC and new_s < FLOOR_SEC
        bad = ratio > threshold and not noise
        flag = "FAIL" if bad else ("ok (sub-second)" if noise and ratio > threshold else "ok")
        print(f"  {q}@{fac}x: {old_s:.2f} -> {new_s:.2f} s ({ratio:.2f}x) {flag}")
        if bad:
            fails.append(f"{q}@{fac}x: {ratio:.2f}x slower (>{threshold}x, "
                         f"{old_s:.2f} -> {new_s:.2f} s)")
for q in sorted(set(new["queries"]) - set(old["queries"])):
    print(f"  {q}: new in roster, no baseline")

if fails:
    print("\nREGRESSIONS:")
    for f in fails:
        print(f"  {f}")
    sys.exit(1)
print("\nscale gate: PASS")
