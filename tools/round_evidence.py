#!/usr/bin/env python
"""One-command round evidence bundle (round-8 verdict item 8).

A round's trust surface was complete but SCATTERED: pytest in a shell
log, three CORRECTNESS_SF* ledgers, the self-folding BENCH_full.json,
two delta gates, the smoke fold, and the warm plan-budget check —
nine artifacts plus BASELINE.md prose. This tool runs the whole
per-round evidence protocol in one process tree and writes ONE
manifest, ROUND_EVIDENCE_r{NN}.json, that a judge can audit
mechanically: per step {cmd, rc, seconds, summary, artifacts with
sha256}, a top-level digest over the artifact hashes, and the git
head the evidence was produced at.

Steps (in run order; --steps / --skip select a subset):

  pytest            python -m pytest tests/ -q -p no:randomly
  plan_warm_check   tools/plan_warm_sweep.py --check   (tier 1 + 2)
  drive_sf0001/001/01
                    tools/oracle_drive.py at each SF (resumable
                    jsonl under /tmp), folded into
                    CORRECTNESS_SF{tag}_r{NN}.json by
                    tools/fold_drive_ledger.py
  bench             python bench.py, --bench-runs times (each run
                    self-folds into BENCH_full.json)
  bench_delta       tools/bench_delta.py --reclear against the
                    committed BENCH_full.json fold history
  smoke             scale_smoke.py, full contract (SMOKE_WAVE=all)
                    in --smoke-slices registry stripes, merged into
                    SMOKE_10X_r{NN}_full.json
  smoke_delta       tools/bench_delta.py --factor 3.0 --reclear
                    against the newest committed prior-round smoke

The cold plan-budget golden is asserted INSIDE pytest
(tests/test_plan_budgets.py, tests/test_plan_budgets_warm.py tier 1),
so it needs no separate step; COPYCHECK/LEAKCHECK are driver-side.

The manifest is written incrementally after every step, so a killed
bundle resumes with --resume (steps already recorded rc=0 for the
same git head are skipped; the SF drives additionally resume at query
grain through oracle_drive's own --resume jsonl). The bundle exits
non-zero if ANY step failed its gate — one number to check.

Usage:
  python tools/round_evidence.py --round 9
  python tools/round_evidence.py --round 9 --resume
  python tools/round_evidence.py --round 9 --steps bench,bench_delta
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF_DRIVES = [  # (tag, data dir, sf) — matrix rows, cheapest first
    ("0001", "/root/testdata/sf0.001", 0.001),
    ("001", "/root/testdata/sf0.01", 0.01),
    ("01", "/root/testdata/sf0.1", 0.1),
]

STEP_ORDER = ["leakgrep", "pytest", "plan_warm_check", "drive_sf0001",
              "drive_sf001", "drive_sf01", "bench", "bench_delta",
              "smoke", "smoke_delta"]

# The judge's round-8 leak audit, as a recorded step: the engine must
# not import the reference's stack (requests is allowed — the REST
# source uses the public library behind an import-try) nor mention
# internal/proprietary hosts. Hits are recorded verbatim in the
# manifest; any hit fails the bundle.
LEAK_PATTERNS = (r"(import|from) +(boto3|psycopg2|airflow|dropbox)\b",
                 r"anthropic", r"\.corp\b", r"\.internal\b",
                 r"zoom\.us", r"api\.zoom")


def digest_of(steps: dict) -> str:
    """Digest over all artifact hashes in SORTED (step, hash) order —
    the ONE definition both seal() and verify_manifest() use. (An
    insertion-order digest failed its own audit after a JSON
    round-trip sorted the keys.)"""
    all_hashes = "".join(
        h for _, s in sorted(steps.items())
        for h in sorted(s.get("artifacts", {}).values()))
    return hashlib.sha256(all_hashes.encode()).hexdigest()


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def git_head() -> tuple[str, bool]:
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    dirty = bool(subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True).stdout.strip())
    return head, dirty


def run_cmd(cmd: list[str], env: dict | None = None,
            timeout: float = 7200) -> tuple[int, str]:
    """Run one step subprocess from the repo root; return (rc, tail).
    Full output goes to a per-step log under /tmp so the manifest
    stays small but nothing is lost."""
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    r = subprocess.run(cmd, cwd=REPO, env=full_env, timeout=timeout,
                       capture_output=True, text=True)
    log = os.path.join("/tmp", "round_evidence_" +
                       re.sub(r"\W+", "_", " ".join(cmd))[:80] + ".log")
    with open(log, "w") as fh:
        fh.write(r.stdout + "\n--- stderr ---\n" + r.stderr)
    tail_lines = (r.stdout.strip().splitlines() or
                  r.stderr.strip().splitlines())[-6:]
    return r.returncode, "\n".join(tail_lines)


def last_json_line(text: str) -> dict:
    dec = json.JSONDecoder()
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:  # raw_decode tolerates trailing text on the line
                return dec.raw_decode(line)[0]  # (fold_drive_ledger
            except ValueError:  # appends "exceptions: [...]")
                continue
    return {}


# ---------------------------------------------------------------------------
# Steps. Each returns {"rc": int, "summary": ..., "artifacts": [paths]}.

def step_leakgrep(args) -> dict:
    hits: list[str] = []
    for pat in LEAK_PATTERNS:
        r = subprocess.run(
            ["grep", "-rInE", pat, "zoom_etl_spark", "tools", "bench.py",
             "scale_smoke.py", "__spark_entry__.py", "--include=*.py",
             # the pattern list itself lives in this file
             "--exclude=round_evidence.py"],
            cwd=REPO, capture_output=True, text=True)
        hits += [f"{pat} :: {line}" for line in
                 r.stdout.strip().splitlines() if line]
    return {"rc": 1 if hits else 0,
            "summary": {"n_hits": len(hits), "hits": hits[:20],
                        "patterns": list(LEAK_PATTERNS)},
            "artifacts": []}


def step_pytest(args) -> dict:
    rc, tail = run_cmd([sys.executable, "-m", "pytest", "tests/", "-q",
                        "-p", "no:randomly"])
    m = re.search(r"(\d+) passed", tail)
    return {"rc": rc, "summary": {"tail": tail.splitlines()[-1:],
                                  "passed": int(m.group(1)) if m else None},
            "artifacts": []}


def step_plan_warm_check(args) -> dict:
    rc, tail = run_cmd([sys.executable, "tools/plan_warm_sweep.py",
                        "--check"])
    return {"rc": rc, "summary": last_json_line(tail) or {"tail": tail},
            "artifacts": []}


def step_drive(tag: str, sf_dir: str, sf: float, args) -> dict:
    rtag = f"r{args.round:02d}"
    jsonl = f"/tmp/zes_drive_sf{tag}_{rtag}.jsonl"
    ledger = f"CORRECTNESS_SF{tag}_{rtag}.json"
    # query-grain resume is SAME-HEAD only: a sidecar marker records
    # the head the jsonl's rows were produced at, and a different
    # current head restarts the drive — otherwise results from an
    # older commit would silently fold into a ledger stamped with the
    # new head (the bundle's provenance contract, at query grain)
    head, _ = git_head()
    marker = jsonl + ".head"
    if os.path.exists(jsonl):
        prior_head = (open(marker).read().strip()
                      if os.path.exists(marker) else "")
        if prior_head != head:
            os.unlink(jsonl)
    with open(marker, "w") as fh:
        fh.write(head)
    rc, tail = run_cmd([sys.executable, "tools/oracle_drive.py",
                        "--sf", sf_dir, "--out", jsonl, "--resume"])
    fold_rc, fold_tail = run_cmd([
        sys.executable, "tools/fold_drive_ledger.py", "--drive", jsonl,
        "--out", ledger, "--metric", f"sf{tag}_oracle_drive",
        "--sf", str(sf)])
    summary = last_json_line(tail)
    summary["fold"] = fold_tail.splitlines()[-1:] if fold_rc else \
        last_json_line(fold_tail)
    return {"rc": rc or fold_rc, "summary": summary,
            "artifacts": [os.path.join(REPO, ledger)]}


def step_bench(args) -> dict:
    rcs, totals = [], []
    for _ in range(args.bench_runs):
        rc, tail = run_cmd([sys.executable, "bench.py"])
        rcs.append(rc)
        totals.append(last_json_line(tail).get("value"))
    full = json.load(open(os.path.join(REPO, "BENCH_full.json")))
    return {"rc": max(rcs),
            "summary": {"run_totals": totals,
                        "runs_folded": full.get("runs_folded"),
                        "errors": sorted(full.get("errors", {}))},
            "artifacts": [os.path.join(REPO, "BENCH_full.json")]}


def step_bench_delta(args) -> dict:
    # the prior is the COMMITTED BENCH_full.json blob (git rev spec,
    # not the working-tree file bench just overwrote): reproducible
    # from the repo alone, and immune to the self-compare degradation
    # where a registry change resets the working fold's history to
    # only this round's runs. The spec pins the RESOLVED commit (not
    # the moving HEAD ref) so the committed artifact's prev_files
    # stays dereferenceable forever.
    head = subprocess.run(
        ["git", "rev-parse", "--short=12", "HEAD"], cwd=REPO,
        capture_output=True, text=True).stdout.strip()
    rc, tail = run_cmd([sys.executable, "tools/bench_delta.py",
                        "--current", "BENCH_full.json",
                        "--prev", f"{head}:BENCH_full.json",
                        "--out", "BENCH_delta.json", "--reclear"])
    return {"rc": rc, "summary": last_json_line(tail) or {"tail": tail},
            "artifacts": [os.path.join(REPO, "BENCH_delta.json")]}


def _latest_committed_smoke(before_round: int) -> str | None:
    tracked = subprocess.run(
        ["git", "ls-files", "SMOKE_10X_r*_full.json"], cwd=REPO,
        capture_output=True, text=True).stdout.split()
    best = None
    for p in tracked:
        m = re.match(r"SMOKE_10X_r(\d+)\w*_full\.json", os.path.basename(p))
        # tie-break same-round re-runs (r06 vs r06b) by name: the
        # suffixed re-run sorts later and is the better prior
        if m and int(m.group(1)) < before_round:
            key = (int(m.group(1)), p)
            if best is None or key > best:
                best = key
    return best[1] if best else None


def step_smoke(args) -> dict:
    rtag = f"r{args.round:02d}"
    out_path = os.path.join(REPO, f"SMOKE_10X_{rtag}_full.json")
    merged: dict[str, float] = {}
    rcs = []
    for i in range(1, args.smoke_slices + 1):
        rc, tail = run_cmd(
            [sys.executable, "scale_smoke.py"],
            env={"SMOKE_WAVE": "all",
                 "SMOKE_SLICE": f"{i}/{args.smoke_slices}"},
            timeout=10800)
        rcs.append(rc)
        merged.update(last_json_line(tail).get("queries", {}))
    artifact = {"metric": "scale_smoke_10x", "unit": "sec", "copies": 10,
                "slices": args.smoke_slices, "n_queries": len(merged),
                "queries": merged,
                "value": round(sum(merged.values()), 2)}
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    return {"rc": max(rcs) if rcs else 1,
            "summary": {"n_queries": len(merged),
                        "value": artifact["value"],
                        "slice_rcs": rcs},
            "artifacts": [out_path]}


def step_smoke_delta(args) -> dict:
    rtag = f"r{args.round:02d}"
    prev = _latest_committed_smoke(args.round)
    if prev is None:
        return {"rc": 1, "summary": {"error": "no committed prior smoke"},
                "artifacts": []}
    rc, tail = run_cmd([sys.executable, "tools/bench_delta.py",
                        "--current", f"SMOKE_10X_{rtag}_full.json",
                        "--prev", prev, "--out", "SMOKE_delta.json",
                        "--factor", "3.0", "--reclear",
                        "--sf-dir", "/tmp/zes_sf1"])
    return {"rc": rc, "summary": last_json_line(tail) or {"tail": tail},
            "artifacts": [os.path.join(REPO, "SMOKE_delta.json")]}


def verify_manifest(manifest_path: str) -> int:
    """Judge mode: recompute every artifact hash the manifest names
    plus the digest over them; report mismatches. Returns exit code."""
    m = json.load(open(manifest_path))
    bad: dict[str, str] = {}
    for step, row in m.get("steps", {}).items():
        for rel, want in row.get("artifacts", {}).items():
            path = os.path.join(REPO, rel)
            if not os.path.exists(path):
                bad[rel] = "missing"
            elif sha256(path) != want:
                bad[rel] = "hash mismatch"
    digest_ok = digest_of(m.get("steps", {})) == m.get("digest")
    print(json.dumps({"metric": "round_evidence_verify",
                      "manifest": os.path.relpath(manifest_path, REPO),
                      "n_artifacts": sum(
                          len(s.get("artifacts", {}))
                          for s in m.get("steps", {}).values()),
                      "mismatches": bad, "digest_ok": digest_ok,
                      "ok": m.get("ok")}))
    return 0 if (not bad and digest_ok) else 1


def make_steps(args) -> dict:
    steps = {
        "leakgrep": lambda: step_leakgrep(args),
        "pytest": lambda: step_pytest(args),
        "plan_warm_check": lambda: step_plan_warm_check(args),
        "bench": lambda: step_bench(args),
        "bench_delta": lambda: step_bench_delta(args),
        "smoke": lambda: step_smoke(args),
        "smoke_delta": lambda: step_smoke_delta(args),
    }
    for tag, sf_dir, sf in SF_DRIVES:
        steps[f"drive_sf{tag}"] = (
            lambda tag=tag, sf_dir=sf_dir, sf=sf:
            step_drive(tag, sf_dir, sf, args))
    return steps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--steps", default=",".join(STEP_ORDER),
                    help="comma-separated subset, run in canonical order")
    ap.add_argument("--skip", default="", help="steps to drop")
    ap.add_argument("--resume", action="store_true",
                    help="skip steps already recorded rc=0 at this head")
    ap.add_argument("--redo", default="",
                    help="steps to re-run even if recorded green")
    ap.add_argument("--accept-stale", action="store_true",
                    help="with --resume: keep green steps recorded at a "
                         "DIFFERENT head, recording the head pair and "
                         "the file diff between them in the manifest "
                         "(legitimate only when the diff cannot affect "
                         "the kept steps — judge-checkable)")
    ap.add_argument("--bench-runs", type=int, default=2)
    ap.add_argument("--smoke-slices", type=int, default=4)
    ap.add_argument("--verify-manifest", action="store_true",
                    help="audit mode: recompute the sha256 of every "
                         "artifact the manifest names and the digest "
                         "over them; exit 1 on any mismatch. Runs "
                         "nothing.")
    args = ap.parse_args()

    if args.verify_manifest:
        sys.exit(verify_manifest(
            os.path.join(REPO, f"ROUND_EVIDENCE_r{args.round:02d}.json")))

    chosen = set(args.steps.split(",")) - {""}
    skipped = set(args.skip.split(",")) - {""}
    redo_named = set(args.redo.split(",")) - {""}
    unknown = (chosen | skipped | redo_named) - set(STEP_ORDER)
    if unknown:  # a typo must not silently drop a gate from the bundle
        print(json.dumps({"metric": "round_evidence", "error":
                          f"unknown step name(s): {sorted(unknown)}",
                          "known": STEP_ORDER}))
        sys.exit(2)
    wanted = [s for s in STEP_ORDER if s in chosen and s not in skipped]
    manifest_path = os.path.join(REPO, f"ROUND_EVIDENCE_r{args.round:02d}.json")
    head, dirty = git_head()

    manifest = {"metric": "round_evidence", "round": args.round,
                "git_head": head, "git_dirty": dirty,
                "started": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                         time.gmtime()),
                "steps": {}}
    if args.resume and os.path.exists(manifest_path):
        prior = json.load(open(manifest_path))
        # resume only evidence produced on this same commit — a new
        # commit invalidates every recorded step, unless --accept-stale
        # explicitly keeps it WITH the head pair + file diff on record
        if prior.get("git_head") == head:
            manifest["steps"] = prior.get("steps", {})
            manifest["started"] = prior.get("started", manifest["started"])
        elif args.accept_stale and prior.get("git_head"):
            manifest["steps"] = prior.get("steps", {})
            manifest["started"] = prior.get("started", manifest["started"])
            diff = subprocess.run(
                ["git", "diff", "--name-only",
                 f"{prior['git_head']}..{head}"], cwd=REPO,
                capture_output=True, text=True)
            manifest["stale_resume"] = {
                "evidence_head": prior["git_head"],
                "current_head": head,
                "diff_files": sorted(diff.stdout.split())
                if diff.returncode == 0 else "unresolvable",
                "prior_stale_resume": prior.get("stale_resume"),
            }

    def seal() -> None:
        """Recompute ok + artifact digest and persist — after every
        step (kill-safe) and once more after the loop (so an all-
        skipped --resume still carries a fresh verdict)."""
        manifest["finished"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime())
        manifest["digest"] = digest_of(manifest["steps"])
        manifest["ok"] = bool(manifest["steps"]) and all(
            s.get("rc") == 0 for s in manifest["steps"].values())
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)

    steps = make_steps(args)
    redo = redo_named
    for name in wanted:
        done = manifest["steps"].get(name)
        if args.resume and done and done.get("rc") == 0 \
                and name not in redo:
            print(json.dumps({"step": name, "skipped": "already green"}))
            continue
        t0 = time.time()
        try:
            res = steps[name]()
        except Exception as e:  # noqa: BLE001 — record, keep bundling
            res = {"rc": 1, "summary": {"error": repr(e)[:500]},
                   "artifacts": []}
        res["seconds"] = round(time.time() - t0, 1)
        # per-step provenance: the head/dirty state the step ACTUALLY
        # ran at (mid-bundle commits happen; the manifest should show
        # exactly which evidence predates them)
        res["git_head"], res["git_dirty"] = git_head()
        res["artifacts"] = {
            os.path.relpath(p, REPO): sha256(p)
            for p in res.get("artifacts", []) if os.path.exists(p)}
        manifest["steps"][name] = res
        seal()
        print(json.dumps({"step": name, "rc": res["rc"],
                          "seconds": res["seconds"],
                          "summary": res["summary"]}))
    seal()

    print(json.dumps({"metric": "round_evidence", "round": args.round,
                      "ok": manifest.get("ok"),
                      "steps": {n: manifest["steps"][n]["rc"]
                                for n in manifest["steps"]},
                      "out": os.path.relpath(manifest_path, REPO)}))
    sys.exit(0 if manifest.get("ok") else 1)


if __name__ == "__main__":
    main()
