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

Errored queries are reported EXPLICITLY (round-7 ADVICE): a query that
errored in the current run lands in `errored_current` (and the tool
exits 1 — a crash must not silently bypass the 2x gate by vanishing
from the compare set), and a query with no clean prior timing lands in
`no_clean_prior` instead of masquerading as newly added.

Usage:
  python tools/bench_delta.py --current BENCH_full.json \
      --prev BENCH_local_r06a.json BENCH_local_r06b.json ... \
      [--out BENCH_delta.json] [--factor 2.0]

The 10x scale smoke uses the SAME tool on its artifacts (round-7
verdict item 5 — SMOKE_10X_r0N_full.json carries an identical
queries/errors shape), at factor 3.0 because replica-scale runs are
noisier than sf0.1:
  python tools/bench_delta.py --current SMOKE_10X_r08_full.json \
      --prev SMOKE_10X_r07_full.json SMOKE_10X_r06b_full.json \
      --out SMOKE_delta.json --factor 3.0
Protocol on flags: identical to the bench gate — reclear each flagged
query warm-solo at the same copies factor, or fold with a dated note.

Exit 1 when the flag list OR the current-run error list is non-empty
(so a round script can gate on it); exit 0 otherwise.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_run(path: str, prefer_fold: bool = False
             ) -> tuple[dict[str, float], set[str]]:
    """(clean per-query seconds, errored query names). Errored queries
    are excluded from the timing map — bench.py still times an errored
    query (often a fast abort), and folding that timing would either
    seed a bogus tiny prior min (spurious flag next round) or let a
    crash-fast current query dodge its real regression — but they are
    returned separately so the caller can surface them instead of
    letting them silently fall out of the compare (round-7 ADVICE).

    With ``prefer_fold`` (prior files only), a self-folding
    BENCH_full.json's `queries_min_of_runs` map is used when present —
    it is already the min across that artifact's run history with
    errored timings excluded per run. The CURRENT run is always read
    from the single-run `queries` map: the gate judges the latest run,
    not its own folded history."""
    d = json.load(open(path))
    bad = set(d.get("errors", {}))
    if prefer_fold and "queries_min_of_runs" in d:
        return ({k: float(v) for k, v in d["queries_min_of_runs"].items()},
                bad)
    q = d.get("queries", d)
    clean = {k: float(v) for k, v in q.items()
             if isinstance(v, (int, float)) and k not in bad}
    return clean, bad


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--current", default="BENCH_full.json")
    ap.add_argument("--prev", nargs="+", required=True,
                    help="prior-round full-run JSONs (minima folded)")
    ap.add_argument("--out", default="BENCH_delta.json")
    ap.add_argument("--factor", type=float, default=2.0)
    args = ap.parse_args()

    cur, cur_errors = load_run(args.current)
    prev_min: dict[str, float] = {}
    prev_errored: set[str] = set()
    for p in args.prev:
        clean, bad = load_run(p, prefer_fold=True)
        prev_errored |= bad
        for k, v in clean.items():
            if k not in prev_min or v < prev_min[k]:
                prev_min[k] = v

    flagged = {}
    for name, sec in sorted(cur.items()):
        base = prev_min.get(name)
        if base is not None and base > 0 and sec > args.factor * base:
            flagged[name] = {"prev_min": base, "current": sec,
                             "ratio": round(sec / base, 2)}
    # A query present in the current run's errors map is a still-
    # registered query that CRASHED — report it as such, never as
    # "gone". Conversely a query whose only prior appearances errored
    # has no clean baseline — report it as such, never as "new".
    cur_names = set(cur) | cur_errors
    prior_names = set(prev_min) | prev_errored
    out = {
        "metric": "bench_round_delta",
        "factor": args.factor,
        "current": args.current,
        "prev_files": args.prev,
        "n_compared": len(set(cur) & set(prev_min)),
        "new_queries": sorted(cur_names - prior_names),
        "gone_queries": sorted(prior_names - cur_names),
        "errored_current": sorted(cur_errors),
        "no_clean_prior": sorted((set(cur) & prev_errored)
                                 - set(prev_min)),
        "flagged": flagged,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"metric": "bench_round_delta",
                      "n_flagged": len(flagged),
                      "n_errored_current": len(cur_errors),
                      "flagged": sorted(flagged)[:20],
                      "errored_current": sorted(cur_errors)[:20],
                      "out": args.out}))
    sys.exit(1 if (flagged or cur_errors) else 0)


if __name__ == "__main__":
    main()
