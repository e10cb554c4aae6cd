#!/usr/bin/env python
"""Round-over-round bench diff (round-7 verdict item 6): compare the
current BENCH_full.json against the PRIOR round's per-query minima and
write BENCH_delta.json naming every query slower than 2x its prior
min. The full-run protocol (BASELINE.md) treats a non-empty flag list
exactly like a maxima breach: reclear each flagged query warm-solo on
an idle host, or fold its maximum with a dated note.

Prior minima are folded across however many prior-round full runs are
passed (the per-query MIN across runs is the established
contention-noise filter — single full-suite runs on this host wobble
2-12x on unchanged plans).

Usage:
  python tools/bench_delta.py --current BENCH_full.json \
      --prev BENCH_local_r06a.json BENCH_local_r06b.json ... \
      [--out BENCH_delta.json] [--factor 2.0]

Exit 1 when the flag list is non-empty (so a round script can gate on
it); exit 0 otherwise.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    """Per-query seconds, DROPPING queries the run recorded under
    'errors' — bench.py still times an errored query (often a fast
    abort), and folding that timing would either seed a bogus tiny
    prior min (spurious flag next round) or let a crash-fast current
    query dodge its real regression."""
    d = json.load(open(path))
    q = d.get("queries", d)
    bad = set(d.get("errors", {}))
    return {k: float(v) for k, v in q.items()
            if isinstance(v, (int, float)) and k not in bad}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--current", default="BENCH_full.json")
    ap.add_argument("--prev", nargs="+", required=True,
                    help="prior-round full-run JSONs (minima folded)")
    ap.add_argument("--out", default="BENCH_delta.json")
    ap.add_argument("--factor", type=float, default=2.0)
    args = ap.parse_args()

    cur = load_queries(args.current)
    prev_min: dict[str, float] = {}
    for p in args.prev:
        for k, v in load_queries(p).items():
            if k not in prev_min or v < prev_min[k]:
                prev_min[k] = v

    flagged = {}
    for name, sec in sorted(cur.items()):
        base = prev_min.get(name)
        if base is not None and base > 0 and sec > args.factor * base:
            flagged[name] = {"prev_min": base, "current": sec,
                             "ratio": round(sec / base, 2)}
    out = {
        "metric": "bench_round_delta",
        "factor": args.factor,
        "current": args.current,
        "prev_files": args.prev,
        "n_compared": len(set(cur) & set(prev_min)),
        "new_queries": sorted(set(cur) - set(prev_min)),
        "gone_queries": sorted(set(prev_min) - set(cur)),
        "flagged": flagged,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"metric": "bench_round_delta",
                      "n_flagged": len(flagged),
                      "flagged": sorted(flagged)[:20],
                      "out": args.out}))
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
