#!/usr/bin/env python3
"""10x scaling gate: fail when any query's per-query time grows
super-linearly between two bench runs at a 10x data-size step.

Three scaling rounds (r8, r10, r11) each caught the SAME failure mode
— a fixed parameter (sample modulus, plane count, df threshold) that
was quadratic in data size — and each was found by judge archaeology
over committed bench files. This gate institutionalizes that check:
run it over the sf0.1 and sf1 bench JSONs and it fails loudly on any
query whose multiplier exceeds the linear-plus-noise budget, so the
next fixed-parameter family is caught by tooling.

Usage:
    python3 tools/check_scaling.py BENCH_small.json BENCH_big.json \
        [--ratio 10] [--limit 12] [--floor 0.15]

  --ratio  data-size ratio between the two runs (default 10)
  --limit  max allowed per-query multiplier (default 12 = linear 10x
           + noise headroom; sub-linear queries pass trivially)
  --floor  seconds below which the small-run time is too noisy to
           gate on (default 0.15 s — a 0.02 s -> 0.3 s query is a
           15x "regression" made of JVM weather, not algorithm)

Exit 0 and a one-line PASS when every shared query is within budget;
exit 1 with the offending multipliers otherwise. Store builds are
checked against the same limit (they may legitimately be sub-linear —
k = sqrt(N) economics — which passes trivially).
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def gate(small, big, ratio, limit, floor, label):
    shared = sorted(set(small) & set(big))
    skipped = sorted((set(small) | set(big)) - set(shared))
    failures = []
    watched = 0
    for q in shared:
        s, b = small[q], big[q]
        if s < floor:
            # too small to gate on — but a big absolute blowup is
            # suspicious even from a noisy base
            if b > limit * max(s, floor):
                failures.append((q, s, b, b / max(s, 1e-9)))
            continue
        watched += 1
        if b / s > limit:
            failures.append((q, s, b, b / s))
    if skipped:
        print(f"{label}: {len(skipped)} entries present in only one run "
              f"(not gated): {', '.join(skipped[:8])}"
              + (" ..." if len(skipped) > 8 else ""))
    for q, s, b, m in sorted(failures, key=lambda x: -x[3]):
        print(f"FAIL {label} {q}: {s:.3f}s -> {b:.3f}s = {m:.1f}x "
              f"(limit {limit}x for a {ratio}x data step)")
    print(f"{label}: {len(shared)} shared, {watched} gated, "
          f"{len(failures)} over {limit}x")
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument("--limit", type=float, default=12.0)
    ap.add_argument("--floor", type=float, default=0.15)
    args = ap.parse_args()

    a, b = load(args.small), load(args.big)
    cal_a, cal_b = a.get("calibration_s"), b.get("calibration_s")
    if cal_a and cal_b and max(cal_a, cal_b) / min(cal_a, cal_b) > 1.5:
        print(f"WARNING: calibration differs {cal_a:.2f}s vs {cal_b:.2f}s — "
              "the two runs did not share host weather; multipliers are "
              "upper bounds, not measurements")

    failures = gate(a.get("queries", {}), b.get("queries", {}),
                    args.ratio, args.limit, args.floor, "query")

    def build_names(d):
        # store-build keys are "name:/abs/sf/dir" — strip the dir so the
        # two runs line up
        return {k.split(":", 1)[0]: v for k, v in d.get("store_builds", {}).items()}
    failures += gate(build_names(a), build_names(b),
                     args.ratio, args.limit, args.floor, "store-build")

    total_a, total_b = a.get("value"), b.get("value")
    if total_a and total_b:
        print(f"total: {total_a:.1f}s -> {total_b:.1f}s = "
              f"{total_b / total_a:.2f}x for a {args.ratio:.0f}x data step")

    if failures:
        print(f"SCALING GATE FAILED: {len(failures)} super-linear entries")
        return 1
    print("SCALING GATE PASSED: nothing super-linear")
    return 0


if __name__ == "__main__":
    sys.exit(main())
