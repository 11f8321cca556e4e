"""Per-op perf regression harness (ROADMAP item 7).

Compares two BENCH_DETAILS.json snapshots and flags regressions.

Usage:
  python tools/bench_diff.py OLD.json NEW.json [--tolerance 0.10]

Exit code 1 when any timing metric regressed beyond the tolerance --
wire into a round's wrap-up as
  python bench.py --details && python tools/bench_diff.py \\
      BENCH_DETAILS_prev.json BENCH_DETAILS.json
"""

import argparse
import json
import sys

TIMING_KEYS = ("fwd_sweep_ms", "train_step_ms", "epoch_seconds")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--tolerance", type=float, default=0.10,
                    help="relative slowdown that counts as a regression")
    args = ap.parse_args()

    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)

    regressions = []
    for name, rec in sorted(new.items()):
        prev = old.get(name)
        if prev is None:
            print(f"  NEW      {name}")
            continue
        for key in TIMING_KEYS:
            if key in rec and key in prev and prev[key]:
                ratio = rec[key] / prev[key]
                flag = ""
                if ratio > 1.0 + args.tolerance:
                    flag = "  <-- REGRESSION"
                    regressions.append((name, key, prev[key], rec[key]))
                elif ratio < 1.0 - args.tolerance:
                    flag = "  (improved)"
                print(f"  {ratio:7.2%}  {name}.{key}: "
                      f"{prev[key]} -> {rec[key]}{flag}")
    for name in sorted(set(old) - set(new)):
        print(f"  DROPPED  {name}")

    if regressions:
        print(f"\n{len(regressions)} regression(s) beyond "
              f"{args.tolerance:.0%}:")
        for name, key, a, b in regressions:
            print(f"  {name}.{key}: {a} -> {b}")
        sys.exit(1)
    print("\nno regressions")


if __name__ == "__main__":
    main()
