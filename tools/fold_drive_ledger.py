#!/usr/bin/env python
"""Fold a tools/oracle_drive.py jsonl into the committed SF-matrix
ledger format (CORRECTNESS_SF*_r*.json): counts, exceptions with their
first-diff detail, and the empty-result-but-still-matching list."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--drive", required=True, help="oracle_drive jsonl")
    ap.add_argument("--out", required=True)
    ap.add_argument("--metric", required=True)
    ap.add_argument("--sf", type=float, required=True)
    args = ap.parse_args()

    last: dict[str, dict] = {}
    for r in map(json.loads, open(args.drive)):
        last[r["q"]] = r  # failures re-run under --resume: last wins

    out = {
        "metric": args.metric,
        "sf": args.sf,
        "n": len(last),
        "value_exact": sum(1 for r in last.values() if r["ok"] is True),
        "rows_only_ran": sum(1 for r in last.values() if r["ok"] is None),
        "exceptions": {q: (r.get("err") or r.get("detail", ""))[:300]
                       for q, r in sorted(last.items())
                       if r["ok"] is False},
        "empty_result_queries_still_matching": sorted(
            q for q, r in last.items()
            if r["ok"] is True and r.get("rows") == 0),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "n", "value_exact", "rows_only_ran")},
                     indent=None),
          "exceptions:", sorted(out["exceptions"]))


if __name__ == "__main__":
    main()
