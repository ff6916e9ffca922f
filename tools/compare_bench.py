"""Diff two bench JSON lines (e.g. BENCH_r05.json vs BENCH_r06.json):
per-query deltas, regressions ranked first, plus added/removed queries.

    python tools/compare_bench.py OLD.json NEW.json [--threshold 1.25]

A query counts as a regression only when the move clears EVERY bar:
  - ratio new/old exceeds the threshold (default 1.25x),
  - absolute delta exceeds 0.2 s (sub-second noise isn't a signal),
  - the move exceeds the measured run-to-run spread of both runs —
    bench.py reports (max-min)/median per query under "spread"; a
    "regression" inside old_spread + new_spread is machine contention,
    not a plan change (the round-5 lesson: apparent 1.6x moves
    re-measured at 0.74x on an idle box). Files without spread data
    (pre-round-6) fall back to ratio+delta only.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thresh = 1.25
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thresh = float(a.split("=", 1)[1]) if "=" in a else thresh
    if len(args) != 2:
        print(__doc__)
        return 2

    def load(path):
        d = json.load(open(path))
        # driver wrapper (BENCH_r{N}.json) nests the bench line under
        # "parsed"; a raw bench.py line has "queries" at top level
        if "queries" not in d and "parsed" in d:
            d = d["parsed"]
        # round-9: bench.py flags contended runs (1-min load > 1.0);
        # a flagged artifact is not comparison-grade — say so loudly
        if d.get("load_warning"):
            print(
                f"WARNING: {path} carries load_warning=true "
                f"(load_avg={d.get('load_avg')}) — deltas against it "
                "measure box contention, not plan changes"
            )
        return d["queries"], d.get("spread", {})

    old, old_spread = load(args[0])
    new, new_spread = load(args[1])
    shared = sorted(set(old) & set(new))
    rows = [(n, old[n], new[n], new[n] / max(old[n], 1e-9)) for n in shared]

    def noise_floor(n: str) -> float:
        # a move within the sum of both runs' relative spreads is noise
        return old_spread.get(n, 0.0) + new_spread.get(n, 0.0)

    regress = [
        r
        for r in rows
        if r[3] > max(thresh, 1 + noise_floor(r[0])) and r[2] - r[1] > 0.2
    ]
    improve = [r for r in rows if r[3] < 1 / thresh and r[1] - r[2] > 0.2]
    print(f"shared {len(shared)}: old {sum(old[n] for n in shared):.1f}s "
          f"-> new {sum(new[n] for n in shared):.1f}s")
    if regress:
        print("\nREGRESSIONS (ratio desc; each exceeds threshold AND "
              "measured spread):")
        for n, o, w, r in sorted(regress, key=lambda x: -x[3]):
            print(f"  {n:34s} {o:7.2f}s -> {w:7.2f}s  ({r:.2f}x, "
                  f"noise floor {1 + noise_floor(n):.2f}x)")
    suppressed = [
        r
        for r in rows
        if r[3] > thresh and r[2] - r[1] > 0.2 and r not in regress
    ]
    if suppressed:
        print("\nwithin measured spread (not regressions):")
        for n, o, w, r in sorted(suppressed, key=lambda x: -x[3]):
            print(f"  {n:34s} {o:7.2f}s -> {w:7.2f}s  ({r:.2f}x, "
                  f"spread allows {1 + noise_floor(n):.2f}x)")
    if improve:
        print("\nimprovements:")
        for n, o, w, r in sorted(improve, key=lambda x: x[3]):
            print(f"  {n:34s} {o:7.2f}s -> {w:7.2f}s  ({r:.2f}x)")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"\nadded ({len(added)}): "
              + ", ".join(f"{n}={new[n]:.2f}s" for n in added))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    return 1 if regress else 0


if __name__ == "__main__":
    sys.exit(main())
