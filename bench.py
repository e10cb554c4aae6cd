#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
compact JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The stdout line keeps only the 20 slowest queries so it stays under the
driver's 2000-char capture window (a full 307-query map is ~40 KB and was
never parseable — 5 rounds of `parsed: null`). The complete per-query
timing / shuffle maps go to BENCH_full.json at the repo root.

BENCH_full.json is SELF-FOLDING (round-7 verdict item 6): single
full-suite runs on this host wobble 2-12x on unchanged plans, so the
regression protocol reasons over the per-query MIN across runs — but a
single-run artifact used to be all that was committed, and 13 of its
rows could read >2x the gated minima while the gate itself was green.
Now each run appends itself to a bounded `runs_history` (last 3 runs,
full per-query maps) carried inside the artifact and recomputes
`queries_min_of_runs` + `runs_folded` across the history, so the
committed artifact always CONTAINS the min-of-N map the protocol
gates on. The history resets whenever sf / cpus / the registered
query-name set changes (a new round's registry edit starts a fresh
fold; an unchanged registry folds the driver's end-of-round run with
the builder's committed local runs, which is exactly the protocol).

Timing = full plan execution to a noop sink (no driver collect transfer),
except streaming/rows-only queries that execute inside their builder.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zoom_etl_spark.registry import all_queries  # noqa: E402
from zoom_etl_spark.session import get_spark  # noqa: E402
from zoom_etl_spark import plans  # noqa: E402
from zoom_etl_spark.metrics import StageMetrics, mb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(min(os.cpu_count() or 8, 32)))
# full per-query maps land here (tests point it at a tmp dir)
FULL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_full.json")


MAX_RUNS_FOLDED = 3  # bounded history: enough for min-of-N, ~120 KB cap


def _git_head() -> str:
    try:
        import subprocess
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001 — metadata only
        return "unknown"


def fold_runs(full: dict, prior: dict | None) -> None:
    """Mutate ``full`` to carry the bounded run history and the
    min-of-N map (see module docstring). ``prior`` is the previous
    BENCH_full.json contents (or None). History folds only when sf,
    cpus, and the query-name set all match — any registry or config
    change starts a fresh fold."""
    entry = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_head": _git_head(),
        "total": full["value"],
        "queries": full["queries"],
        "errors": sorted(full.get("errors", {})),
    }
    history = [entry]
    if (prior and prior.get("sf") == full["sf"]
            and prior.get("cpus") == full["cpus"]
            and set(prior.get("queries", {})) == set(full["queries"])):
        history = (prior.get("runs_history", []) + history)[-MAX_RUNS_FOLDED:]
    min_map: dict[str, float] = {}
    for run in history:
        errored = set(run.get("errors", []))
        for name, sec in run["queries"].items():
            if name in errored:  # an errored timing is often a fast
                continue         # abort — never a legitimate minimum
            if name not in min_map or sec < min_map[name]:
                min_map[name] = sec
    full["runs_history"] = history
    full["runs_folded"] = len(history)
    full["queries_min_of_runs"] = min_map


def _sf_label(sf_dir: str) -> float | str:
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            return float(tail[2:])
        except ValueError:
            pass
    return tail


def compact_line(full: dict, max_len: int = 1900) -> str:
    """The stdout JSON line: total + the 20 slowest queries + cost
    totals, guaranteed under ``max_len`` so the driver's 2000-char tail
    always captures it whole (BENCH_r01..r05 recorded `parsed: null`
    because the full 307-query map was a ~40 KB line). The complete
    maps live in BENCH_full.json."""
    timings = full["queries"]
    top20 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    out = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "queries": {k: round(v, 2) for k, v in top20.items()},
        "sf": full["sf"],
        "cpus": full["cpus"],
        "n_queries": full["n_queries"],
        "n_errors": len(full.get("errors", {})),
        "queries_note": "20 slowest of n_queries; full map in BENCH_full.json",
    }
    if "runs_folded" in full:  # min-of-N headline (round-7 item 6)
        out["runs_folded"] = full["runs_folded"]
        out["min_of_runs_total"] = round(
            sum(full["queries_min_of_runs"].values()), 2)
    if full.get("errors"):  # names only — messages live in BENCH_full.json
        out["error_names"] = sorted(full["errors"])[:10]
    if "cost_totals_mb" in full:
        out["cost_totals_mb"] = full["cost_totals_mb"]
    line = json.dumps(out)
    if len(line) > max_len:  # hard guard: never regress to unparseable
        out.pop("queries", None)
        out.pop("error_names", None)
        out["queries_note"] = "full map in BENCH_full.json"
        line = json.dumps(out)
    return line


def main() -> None:
    spark = get_spark("zoom-etl-spark-bench", cpus=CPUS,
                      shuffle_partitions=max(int(CPUS) * 2, 16), ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # JVM/codegen warmup so the first measured query isn't charged for init
    try:
        plans.flagship(spark, SF_DIR).write.mode(
            "overwrite").format("noop").save()
    except Exception:  # noqa: BLE001 — warmup is best-effort
        pass

    meter = StageMetrics(spark)  # per-query shuffle/spill cost attribution
    timings: dict[str, float] = {}
    shuffle_write_mb: dict[str, float] = {}
    cost_totals = {"inputBytes": 0, "shuffleReadBytes": 0,
                   "shuffleWriteBytes": 0, "memoryBytesSpilled": 0,
                   "diskBytesSpilled": 0}
    errors: dict[str, str] = {}

    def _run_one(name: str, fn) -> None:
        # One flaky query must never zero the whole artifact (round-3
        # BENCH was rc=1 from a single transient streaming-state abort):
        # record the error, keep the JSON line parseable, keep going.
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            if df.isStreaming:  # already executed inside the builder
                pass
            else:
                df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 — harness survival
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            timings[name] = round(time.time() - t0, 3)
        cost = meter.delta()
        if cost:
            shuffle_write_mb[name] = mb(cost["shuffleWriteBytes"])
            for k in cost_totals:
                cost_totals[k] += cost[k]
        # per-query isolation: drop caches a query persisted internally
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass

    for name in sorted(specs):
        _run_one(name, specs[name].fn)
    _run_one("flagship_topk_revenue",
             lambda s, d: plans.flagship(s, d))

    total = round(sum(timings.values()), 3)
    full = {
        "metric": "suite_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(SF_DIR),
        "cpus": int(CPUS),
        "n_queries": len(timings),
    }
    if errors:
        full["errors"] = errors
    if meter.enabled:
        full["shuffle_write_mb"] = shuffle_write_mb
        full["cost_totals_mb"] = {k: mb(v) for k, v in cost_totals.items()}
    prior = None
    try:
        with open(FULL_PATH) as fh:
            prior = json.load(fh)
    except (OSError, ValueError):  # first run / corrupt file: fresh fold
        prior = None
    fold_runs(full, prior)
    try:
        with open(FULL_PATH, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
    except OSError as e:  # read-only checkout must not kill the run
        errors["__bench_full_write__"] = f"{type(e).__name__}: {e}"[:200]

    print(compact_line(full))
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass
    # rc=0 when the artifact is representative (>=95% of queries timed
    # cleanly); a systemic failure still exits nonzero.
    ok = len(timings) - len([k for k in errors if k in timings])
    sys.exit(0 if ok >= 0.95 * len(timings) else 1)


if __name__ == "__main__":
    main()
