"""tools/bench_delta.py: prior minima fold across runs, the 2x flag
binds, new/gone queries are reported, exit code gates on flags."""

from __future__ import annotations

import json
import subprocess
import sys


def _write(tmp_path, name, queries):
    p = tmp_path / name
    p.write_text(json.dumps({"metric": "suite_total_wall_clock",
                             "queries": queries}))
    return str(p)


def _run(tmp_path, cur, prevs, factor=None):
    out = str(tmp_path / "delta.json")
    cmd = [sys.executable, "/root/repo/tools/bench_delta.py",
           "--current", cur, "--prev", *prevs, "--out", out]
    if factor:
        cmd += ["--factor", str(factor)]
    r = subprocess.run(cmd, capture_output=True, text=True)
    return r.returncode, json.load(open(out))


def test_minima_fold_and_flagging(tmp_path):
    a = _write(tmp_path, "a.json", {"q1": 4.0, "q2": 1.0, "gone": 1.0})
    b = _write(tmp_path, "b.json", {"q1": 1.0, "q2": 5.0})
    # q1 prior min = 1.0 (run b), q2 prior min = 1.0 (run a)
    cur = _write(tmp_path, "cur.json",
                 {"q1": 2.5, "q2": 1.9, "brand_new": 9.9})
    rc, d = _run(tmp_path, cur, [a, b])
    assert rc == 1
    assert set(d["flagged"]) == {"q1"}         # 2.5 > 2 x 1.0; q2 under
    assert d["flagged"]["q1"]["ratio"] == 2.5
    assert d["new_queries"] == ["brand_new"]   # never compared, never flags
    assert d["gone_queries"] == ["gone"]
    assert d["n_compared"] == 2


def test_clean_round_exits_zero(tmp_path):
    a = _write(tmp_path, "a.json", {"q1": 1.0})
    cur = _write(tmp_path, "cur.json", {"q1": 1.9})
    rc, d = _run(tmp_path, cur, [a])
    assert rc == 0 and d["flagged"] == {}


def test_errored_queries_reported_explicitly(tmp_path):
    """bench.py times errored queries too (often a fast abort): such a
    timing must neither seed a bogus prior min nor dodge a flag by
    crashing fast in the current run. Round-7 ADVICE: a current-run
    crash is a dedicated `errored_current` entry (and exits 1), a
    prior-only error is `no_clean_prior` — neither masquerades as a
    new/gone query."""
    prev = tmp_path / "prev.json"
    prev.write_text(json.dumps({
        "queries": {"q1": 0.5, "q2": 1.0},
        "errors": {"q1": "StreamingQueryException: transient abort"}}))
    cur = tmp_path / "cur.json"
    cur.write_text(json.dumps({
        "queries": {"q1": 8.0, "q2": 0.4},
        "errors": {"q2": "AnalysisException: crash-fast"}}))
    rc, d = _run(tmp_path, str(cur), [str(prev)])
    # q1's 0.5 prior was an errored timing -> no 16x flag, but it is
    # named in no_clean_prior; q2's current run CRASHED -> named in
    # errored_current and the tool gates (exit 1). Both are still
    # registered queries, so neither is "new" nor "gone".
    assert rc == 1 and d["flagged"] == {}
    assert d["n_compared"] == 0
    assert d["errored_current"] == ["q2"]
    assert d["no_clean_prior"] == ["q1"]
    assert d["new_queries"] == [] and d["gone_queries"] == []


def test_truly_new_and_gone_still_reported(tmp_path):
    """Genuine additions/removals (no errors involved) keep their
    new/gone classification after the errored-query split."""
    a = _write(tmp_path, "a.json", {"q1": 1.0, "gone": 1.0})
    cur = _write(tmp_path, "cur.json", {"q1": 1.2, "brand_new": 2.0})
    rc, d = _run(tmp_path, cur, [a])
    assert rc == 0
    assert d["new_queries"] == ["brand_new"]
    assert d["gone_queries"] == ["gone"]
    assert d["errored_current"] == [] and d["no_clean_prior"] == []


def test_factor_override(tmp_path):
    a = _write(tmp_path, "a.json", {"q1": 1.0})
    cur = _write(tmp_path, "cur.json", {"q1": 1.9})
    rc, d = _run(tmp_path, cur, [a], factor=1.5)
    assert rc == 1 and set(d["flagged"]) == {"q1"}


def test_prior_fold_map_preferred(tmp_path):
    """A self-folding prior artifact's queries_min_of_runs (already the
    min across its run history) beats its single-run map; the current
    file's fold map is ignored (the gate judges the latest run)."""
    prev = tmp_path / "prev.json"
    prev.write_text(json.dumps({
        "queries": {"q1": 9.0},              # noisy final run
        "queries_min_of_runs": {"q1": 1.0},  # the gated minimum
        "runs_folded": 2}))
    cur = tmp_path / "cur.json"
    cur.write_text(json.dumps({
        "queries": {"q1": 2.5},
        "queries_min_of_runs": {"q1": 0.1}}))  # must NOT be compared
    rc, d = _run(tmp_path, str(cur), [str(prev)])
    assert rc == 1 and d["flagged"]["q1"]["prev_min"] == 1.0
    assert d["flagged"]["q1"]["current"] == 2.5
