#!/usr/bin/env python
"""Round-over-round bench diff (round-7 verdict item 6; hardened per
round-8 items 3+4): compare the current BENCH_full.json against the
PRIOR round's per-query minima and write BENCH_delta.json naming every
query slower than 2x its prior min.

Prior minima are folded across however many prior-round full runs are
passed (the per-query MIN across runs is the established
contention-noise filter — single full-suite runs on this host wobble
2-12x on unchanged plans), under three round-8 hardenings:

1. **Committed priors only.** Every --prev must be a `REV:PATH` git
   spec (read via git show — committed by construction; the natural
   prior is `HEAD:BENCH_full.json` BEFORE this round's runs land) or
   a git-tracked repo file that is CLEAN in the working tree (a
   tracked-but-edited prior is as unrecoverable as the round-8
   artifact's /tmp/bench_full_r07.json). --allow-uncommitted exists
   for ad-hoc local use and unit tests; the committed round artifacts
   must not use it.

2. **Re-plan-aware priors.** docs/replans.json records queries whose
   plan deliberately changed (query -> since/commit/note). Prior runs
   timestamped before `since` are dropped for that query; priors of
   unknown age (artifacts without per-run timestamps, e.g. the SMOKE
   files) are dropped conservatively and reported in `replan_dropped`
   — a re-planned query's first post-re-plan round establishes a
   fresh baseline instead of flagging against the dead plan.

3. **Machine-recorded reclears** (--reclear): the former hand-run
   protocol step. Each flagged query is re-run warm-solo in ONE fresh
   session (cold + warm timing, min-of-2 is the verdict input) and
   the {cold, warm, best, verdict} row lands in the artifact itself.
   `cleared` (best <= factor * prev_min) drops the flag from the exit
   gate; `confirmed_regression` and reclear errors keep it.

Errored queries are reported EXPLICITLY (round-7 ADVICE): a query that
errored in the current run lands in `errored_current` (and the tool
exits 1 — a crash must not silently bypass the gate by vanishing from
the compare set), and a query with no clean prior timing lands in
`no_clean_prior` instead of masquerading as newly added.

Usage:
  python tools/bench_delta.py --current BENCH_full.json \
      --prev BENCH_local_r08a.json ... [--out BENCH_delta.json] \
      [--factor 2.0] [--reclear [--sf-dir /root/testdata/sf0.1]]

The 10x scale smoke uses the SAME tool on its artifacts at factor 3.0
(replica-scale runs are noisier than sf0.1); pass the replica dir as
--sf-dir when reclearing:
  python tools/bench_delta.py --current SMOKE_10X_r09_full.json \
      --prev SMOKE_10X_r08_full.json --out SMOKE_delta.json \
      --factor 3.0 --reclear --sf-dir /tmp/zes_sf1

Exit 1 when any UNCLEARED flag or current-run error remains; exit 2 on
an uncommitted prior; exit 0 otherwise.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_REPLANS = os.path.join(REPO, "docs", "replans.json")


def _norm_ts(ts: str) -> str:
    """Normalize ISO-8601 to a canonical UTC `...Z` string so
    fixed-width lexicographic compare equals chronological. Parses the
    offset properly — a `since` recorded from a +02:00 machine must
    not sort as local-time text against a `Z` run timestamp (that
    mis-classifies runs within the offset window around a re-plan).
    Unparseable strings fall back to the raw value (compares as
    before; never raises inside the gate)."""
    from datetime import datetime, timezone
    try:
        dt = datetime.fromisoformat(ts.replace("Z", "+00:00"))
        if dt.tzinfo is None:  # runs_history stamps are UTC by contract
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return ts.replace("+00:00", "Z")


def load_replans(path: str | None) -> dict[str, str]:
    """query name -> normalized `since` timestamp. Missing file = empty
    ledger (a repo without re-plans needs no file)."""
    if not path or not os.path.exists(path):
        return {}
    raw = json.load(open(path))
    return {name: _norm_ts(entry["since"])
            for name, entry in raw.items()
            if isinstance(entry, dict) and "since" in entry}


def is_rev_path(spec: str) -> bool:
    """True for `REV:PATH` prior specs (resolved via git cat-file —
    committed by construction, the strongest reproducibility form)."""
    rev, sep, path = spec.partition(":")
    return bool(sep) and bool(rev) and bool(path) \
        and not os.path.exists(spec) and "/" not in rev


def load_json_prior(spec: str) -> dict:
    """Load a prior artifact from a working-tree path or a `REV:PATH`
    git spec. REV:PATH reads the blob at that revision, so the prior
    is recoverable from the repo alone even after the working-tree
    file is overwritten (the previous round's committed BENCH_full
    fold is `HEAD:BENCH_full.json` before this round's runs land)."""
    if is_rev_path(spec):
        r = subprocess.run(["git", "show", spec], cwd=REPO,
                           capture_output=True, text=True)
        if r.returncode != 0:
            raise FileNotFoundError(
                f"{spec}: {r.stderr.strip()[:200]}")
        return json.loads(r.stdout)
    return json.load(open(spec))


def is_committed(path: str) -> bool:
    """True iff `path` is a git prior the committed delta can be
    reproduced from: a `REV:PATH` spec (always), or a git-tracked
    repo file that is CLEAN in the working tree — a tracked-but-
    locally-edited prior is exactly as unrecoverable as a /tmp file."""
    if is_rev_path(path):
        return True
    ap = os.path.abspath(path)
    if not ap.startswith(REPO + os.sep):
        return False
    rel = os.path.relpath(ap, REPO)
    r = subprocess.run(
        ["git", "ls-files", "--error-unmatch", rel],
        cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        return False
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--", rel],
        cwd=REPO, capture_output=True, text=True).stdout.strip()
    return not dirty


def _errored(d: dict) -> set[str]:
    e = d.get("errors", {})
    return set(e)  # dict (current artifacts) or list (fold entries)


def load_current(path: str) -> tuple[dict[str, float], set[str]]:
    """(clean per-query seconds, errored names) for the CURRENT run —
    always the single-run `queries` map: the gate judges the latest
    run, not its own folded history. Errored timings are excluded from
    the map (often a fast abort — not a legitimate timing) but
    returned separately so the caller surfaces them (round-7 ADVICE).
    """
    d = json.load(open(path))
    bad = _errored(d)
    q = d.get("queries", d)
    clean = {k: float(v) for k, v in q.items()
             if isinstance(v, (int, float)) and k not in bad}
    return clean, bad


def load_prior(path: str, replans: dict[str, str]
               ) -> tuple[dict[str, float], set[str], set[str]]:
    """(per-query min, errored names, replan-dropped names) for one
    prior artifact.

    A self-folding BENCH_full.json's `runs_history` is refolded here
    (rather than trusting `queries_min_of_runs`) so the re-plan filter
    can drop individual PRE-re-plan runs by their `ts`. Artifacts
    without per-run timestamps (fold-map-only files, single-run files,
    SMOKE artifacts) fall back to `queries_min_of_runs` then the flat
    queries map, where a re-planned query's age is unknowable — it is
    dropped conservatively."""
    d = load_json_prior(path)
    runs = d.get("runs_history")
    if runs:
        min_map: dict[str, float] = {}
        errored: set[str] = set()
        seen: set[str] = set()
        for run in runs:
            bad = _errored(run)
            errored |= bad
            ts = _norm_ts(run.get("ts", ""))
            for name, sec in run.get("queries", {}).items():
                seen.add(name)
                if name in bad or not isinstance(sec, (int, float)):
                    continue  # same guard the flat path applies
                since = replans.get(name)
                if since and (not ts or ts < since):
                    continue  # pre-re-plan (or unknown-age) timing
                if name not in min_map or sec < min_map[name]:
                    min_map[name] = float(sec)
        dropped = {n for n in seen & set(replans)
                   if n not in min_map and n not in errored}
        return min_map, errored, dropped

    bad = _errored(d)
    q = d.get("queries_min_of_runs", d.get("queries", d))
    clean = {k: float(v) for k, v in q.items()
             if isinstance(v, (int, float)) and k not in bad}
    dropped = set(clean) & set(replans)  # age unknown -> conservative
    for name in dropped:
        del clean[name]
    return clean, bad, dropped


# ---------------------------------------------------------------------------
# Reclear: re-run flagged queries warm-solo and record the verdict.

def apply_reclears(flagged: dict[str, dict], runner, factor: float
                   ) -> list[str]:
    """Mutate each flag with a machine-recorded reclear row and return
    the names that REMAIN failing (confirmed regressions + reclear
    errors). ``runner(name)`` returns {"cold": s, "warm": s} or
    {"error": msg}; injectable so the verdict logic is unit-testable
    without a Spark session."""
    remaining: list[str] = []
    for name in sorted(flagged):
        info = flagged[name]
        res = runner(name)
        if "error" in res:
            info["reclear"] = {"verdict": "error", "error": res["error"]}
            remaining.append(name)
            continue
        best = min(res["cold"], res["warm"])
        verdict = ("cleared" if best <= factor * info["prev_min"]
                   else "confirmed_regression")
        info["reclear"] = {"cold": res["cold"], "warm": res["warm"],
                           "best": best, "verdict": verdict}
        if verdict != "cleared":
            remaining.append(name)
    return remaining


def make_spark_runner(sf_dir: str, cpus: str):
    """The real reclear runner: ONE fresh session (this process just
    started — it is the fresh idle session the protocol wants), lazy
    so --reclear with zero flags never boots a JVM. Mirrors bench.py's
    timing rule: full plan to a noop sink; streaming queries execute
    inside their builder."""
    state: dict = {}

    def _boot():
        sys.path.insert(0, REPO)
        from zoom_etl_spark import plans
        from zoom_etl_spark.registry import all_queries
        from zoom_etl_spark.session import get_spark
        spark = get_spark("bench-delta-reclear", cpus=cpus,
                          shuffle_partitions=max(int(cpus) * 2, 16))
        spark.sparkContext.setLogLevel("ERROR")
        try:  # JVM/codegen warmup, same as bench.py
            plans.flagship(spark, sf_dir).write.mode(
                "overwrite").format("noop").save()
        except Exception:  # noqa: BLE001 — warmup is best-effort
            pass
        specs = {n: s.fn for n, s in all_queries().items()}
        specs["flagship_topk_revenue"] = plans.flagship
        state.update(spark=spark, specs=specs)

    def run(name: str) -> dict:
        if "spark" not in state:
            _boot()
        spark, specs = state["spark"], state["specs"]
        fn = specs.get(name)
        if fn is None:
            return {"error": f"unknown query {name!r}"}

        def once() -> float:
            t0 = time.time()
            df = fn(spark, sf_dir)
            if not df.isStreaming:
                df.write.mode("overwrite").format("noop").save()
            sec = round(time.time() - t0, 3)
            try:
                spark.catalog.clearCache()
            except Exception:  # noqa: BLE001
                pass
            return sec

        try:
            cold = once()
            warm = once()
            return {"cold": cold, "warm": warm}
        except Exception as e:  # noqa: BLE001 — record, keep the flag
            return {"error": f"{type(e).__name__}: {e}"[:500]}

    return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--current", default="BENCH_full.json")
    ap.add_argument("--prev", nargs="+", required=True,
                    help="prior-round full-run JSONs (minima folded); "
                         "must be git-tracked repo files")
    ap.add_argument("--out", default="BENCH_delta.json")
    ap.add_argument("--factor", type=float, default=2.0)
    ap.add_argument("--replans", default=DEFAULT_REPLANS,
                    help="re-plan ledger (default docs/replans.json)")
    ap.add_argument("--allow-uncommitted", action="store_true",
                    help="skip the committed-prior check (ad-hoc use "
                         "only — committed deltas must not set this)")
    ap.add_argument("--reclear", action="store_true",
                    help="re-run flagged queries warm-solo and record "
                         "{cold,warm,best,verdict} in the artifact")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"),
                    help="data dir for --reclear runs (pass the "
                         "replica dir for smoke reclears)")
    ap.add_argument("--cpus",
                    default=os.environ.get(
                        "SPARK_GRAFT_CPUS",
                        str(min(os.cpu_count() or 8, 32))))
    args = ap.parse_args()

    if not args.allow_uncommitted:
        uncommitted = [p for p in args.prev if not is_committed(p)]
        if uncommitted:
            print(json.dumps({
                "metric": "bench_round_delta", "error":
                "uncommitted prior(s) — the delta would not be "
                "reproducible from the repo alone",
                "uncommitted": uncommitted}))
            sys.exit(2)

    replans = load_replans(args.replans)
    cur, cur_errors = load_current(args.current)
    prev_min: dict[str, float] = {}
    prev_errored: set[str] = set()
    replan_dropped: set[str] = set()
    for p in args.prev:
        clean, bad, dropped = load_prior(p, replans)
        prev_errored |= bad
        replan_dropped |= dropped
        for k, v in clean.items():
            if k not in prev_min or v < prev_min[k]:
                prev_min[k] = v
    replan_dropped -= set(prev_min)  # a post-re-plan timing survived

    flagged = {}
    for name, sec in sorted(cur.items()):
        base = prev_min.get(name)
        if base is not None and base > 0 and sec > args.factor * base:
            flagged[name] = {"prev_min": base, "current": sec,
                             "ratio": round(sec / base, 2)}

    failing = sorted(flagged)
    if args.reclear and flagged:
        runner = make_spark_runner(args.sf_dir, args.cpus)
        failing = apply_reclears(flagged, runner, args.factor)

    # A query present in the current run's errors map is a still-
    # registered query that CRASHED — report it as such, never as
    # "gone". A query whose only prior appearances errored has no
    # clean baseline — "no_clean_prior", never "new". A query whose
    # priors were all dropped by the re-plan ledger is "replan_
    # dropped", never "new".
    cur_names = set(cur) | cur_errors
    prior_names = set(prev_min) | prev_errored | replan_dropped
    out = {
        "metric": "bench_round_delta",
        "factor": args.factor,
        "current": args.current,
        "prev_files": args.prev,
        "replans_file": os.path.relpath(args.replans, REPO)
        if os.path.exists(args.replans) else None,
        "n_compared": len(set(cur) & set(prev_min)),
        "new_queries": sorted(cur_names - prior_names),
        "gone_queries": sorted(prior_names - cur_names),
        "errored_current": sorted(cur_errors),
        "no_clean_prior": sorted((set(cur) & prev_errored)
                                 - set(prev_min) - replan_dropped),
        "replan_dropped": sorted(replan_dropped),
        "flagged": flagged,
    }
    if args.reclear:
        out["reclear"] = {"sf_dir": args.sf_dir,
                          "remaining_after_reclear": failing}
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"metric": "bench_round_delta",
                      "n_flagged": len(flagged),
                      "n_failing": len(failing),
                      "n_errored_current": len(cur_errors),
                      "flagged": sorted(flagged)[:20],
                      "errored_current": sorted(cur_errors)[:20],
                      "replan_dropped": sorted(replan_dropped)[:10],
                      "out": args.out}))
    sys.exit(1 if (failing or cur_errors) else 0)


if __name__ == "__main__":
    main()
