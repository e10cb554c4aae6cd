"""tools/round_evidence.py — the pure parts of the evidence bundle
(round-8 verdict item 8). The subprocess steps are exercised by the
bundle itself each round; these tests pin the helpers the manifest's
trustworthiness rests on: JSON-line scraping, prior-smoke discovery,
and the resume/digest semantics."""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import round_evidence as rev  # noqa: E402


def test_last_json_line_takes_last_parseable():
    text = ('# 12.2s flagship\n{"metric": "old", "value": 1}\n'
            'WARN noise {not json\n{"metric": "new", "value": 2}\n# bye')
    assert rev.last_json_line(text) == {"metric": "new", "value": 2}


def test_last_json_line_empty_on_no_json():
    assert rev.last_json_line("no json here\nat all") == {}


def test_last_json_line_tolerates_trailing_text():
    # fold_drive_ledger prints '{...} exceptions: []' on one line
    assert rev.last_json_line(
        '{"metric": "sf01_oracle_drive", "n": 312} exceptions: []'
    ) == {"metric": "sf01_oracle_drive", "n": 312}


def test_latest_committed_smoke_picks_newest_prior_round():
    # repo truth: r05..r08 smoke folds are committed
    assert rev._latest_committed_smoke(9).endswith(
        "SMOKE_10X_r08_full.json")
    assert rev._latest_committed_smoke(7).endswith(
        "SMOKE_10X_r06b_full.json")
    # round 5 predates every _full artifact except r05's own
    assert rev._latest_committed_smoke(5) is None


def test_sha256_matches_cli(tmp_path):
    p = tmp_path / "x.json"
    p.write_text('{"a": 1}')
    expect = subprocess.run(["sha256sum", str(p)], capture_output=True,
                            text=True).stdout.split()[0]
    assert rev.sha256(str(p)) == expect


def test_leakgrep_is_clean_on_this_repo():
    """Doubles as the LOCAL leak gate: the engine package must never
    import the reference's stack or name internal hosts."""
    class A:
        pass
    res = rev.step_leakgrep(A())
    assert res["rc"] == 0, res["summary"]["hits"]
    assert res["summary"]["n_hits"] == 0


def test_step_order_covers_every_step():
    class A:  # minimal args stand-in
        round = 9
        bench_runs = 1
        smoke_slices = 4
    assert sorted(rev.make_steps(A())) == sorted(rev.STEP_ORDER)


@pytest.mark.parametrize("flag,expect", [(True, 0), (False, 1)])
def test_bundle_resume_skips_green_steps_same_head(tmp_path, monkeypatch,
                                                   flag, expect):
    """--resume skips an rc=0 step recorded at the same git head; a
    different head invalidates the recording and the step re-runs."""
    calls = []
    monkeypatch.setattr(rev, "make_steps", lambda args: {
        "pytest": lambda: calls.append("pytest") or
        {"rc": 0, "summary": {}, "artifacts": []}})
    monkeypatch.setattr(rev, "git_head", lambda: ("fakehead", False))
    manifest = {"git_head": "fakehead" if flag else "someotherhead",
                "steps": {"pytest": {"rc": 0, "summary": {},
                                     "artifacts": {}}}}
    mpath = tmp_path / "ROUND_EVIDENCE_r99.json"
    mpath.write_text(json.dumps(manifest))
    monkeypatch.setattr(rev, "REPO", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["round_evidence.py", "--round",
                                      "99", "--steps", "pytest",
                                      "--resume"])
    with pytest.raises(SystemExit) as ei:
        rev.main()
    assert ei.value.code == 0
    assert len(calls) == expect  # skipped iff same head
    out = json.loads(mpath.read_text())
    assert out["steps"]["pytest"]["rc"] == 0
    if expect:  # re-ran: manifest rewritten with ok + digest
        assert out["ok"] is True
        assert "digest" in out


def _run_main(tmp_path, monkeypatch, argv_tail, prior_manifest,
              step_rc=0):
    """Drive main() with a single fake 'pytest' step; return
    (n_calls, final manifest)."""
    calls = []
    monkeypatch.setattr(rev, "make_steps", lambda args: {
        "pytest": lambda: calls.append("pytest") or
        {"rc": step_rc, "summary": {}, "artifacts": []}})
    monkeypatch.setattr(rev, "git_head", lambda: ("newhead", False))
    mpath = tmp_path / "ROUND_EVIDENCE_r99.json"
    mpath.write_text(json.dumps(prior_manifest))
    monkeypatch.setattr(rev, "REPO", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["round_evidence.py", "--round",
                                      "99", "--steps", "pytest"]
                        + argv_tail)
    with pytest.raises(SystemExit):
        rev.main()
    return len(calls), json.loads(mpath.read_text())


GREEN_PRIOR = {"git_head": "oldhead", "started": "T0",
               "steps": {"pytest": {"rc": 0, "summary": {},
                                    "artifacts": {}}}}


def test_redo_forces_rerun_of_green_step(tmp_path, monkeypatch):
    prior = dict(GREEN_PRIOR, git_head="newhead")
    n, out = _run_main(tmp_path, monkeypatch,
                       ["--resume", "--redo", "pytest"], prior)
    assert n == 1  # same head + green, but --redo re-runs it
    assert out["steps"]["pytest"]["git_head"] == "newhead"


def test_accept_stale_keeps_steps_and_records_head_pair(tmp_path,
                                                        monkeypatch):
    monkeypatch.setattr(rev.subprocess, "run", lambda *a, **k: type(
        "R", (), {"returncode": 0, "stdout": "README.md\n"})())
    n, out = _run_main(tmp_path, monkeypatch,
                       ["--resume", "--accept-stale"], GREEN_PRIOR)
    assert n == 0  # stale green step kept...
    sr = out["stale_resume"]  # ...but the head pair is ON RECORD
    assert sr["evidence_head"] == "oldhead"
    assert sr["current_head"] == "newhead"
    assert sr["diff_files"] == ["README.md"]


def test_stale_without_accept_reruns(tmp_path, monkeypatch):
    n, out = _run_main(tmp_path, monkeypatch, ["--resume"], GREEN_PRIOR)
    assert n == 1
    assert "stale_resume" not in out


def test_verify_manifest_detects_tamper(tmp_path, monkeypatch):
    import hashlib
    art = tmp_path / "CORRECTNESS_X.json"
    art.write_text('{"n": 312}')
    h = hashlib.sha256(art.read_bytes()).hexdigest()
    manifest = {"ok": True, "digest":
                hashlib.sha256(h.encode()).hexdigest(),
                "steps": {"drive": {"rc": 0, "artifacts":
                                    {"CORRECTNESS_X.json": h}}}}
    mpath = tmp_path / "ROUND_EVIDENCE_r98.json"
    mpath.write_text(json.dumps(manifest))
    monkeypatch.setattr(rev, "REPO", str(tmp_path))
    assert rev.verify_manifest(str(mpath)) == 0
    art.write_text('{"n": 311}')  # tamper
    assert rev.verify_manifest(str(mpath)) == 1
    art.unlink()  # missing artifact also fails
    assert rev.verify_manifest(str(mpath)) == 1


def test_digest_is_insertion_order_independent():
    """The review's top finding: seal() hashed artifact hashes in step
    INSERTION order while verify recomputed over JSON-sorted keys, so
    a fresh bundle failed its own audit. digest_of is now the single
    definition, sorted."""
    run_order = {}
    run_order["drive_sf01"] = {"rc": 0, "artifacts": {"c.json": "h1"}}
    run_order["bench"] = {"rc": 0, "artifacts": {"b.json": "h2"}}
    sorted_order = dict(sorted(run_order.items()))
    assert list(run_order) != list(sorted_order)  # genuinely differs
    assert rev.digest_of(run_order) == rev.digest_of(sorted_order)


def test_fresh_bundle_passes_its_own_audit(tmp_path, monkeypatch):
    """End-to-end: a fresh run whose steps land in non-sorted order
    must verify_manifest clean after the JSON round-trip."""
    a1 = tmp_path / "c1.json"
    a2 = tmp_path / "c2.json"

    def step(path, text):
        path.write_text(text)
        return {"rc": 0, "summary": {}, "artifacts": [str(path)]}

    monkeypatch.setattr(rev, "make_steps", lambda args: {
        "drive_sf01": lambda: step(a1, "one"),   # runs before 'bench'
        "bench": lambda: step(a2, "two")})        # but sorts after it
    monkeypatch.setattr(rev, "git_head", lambda: ("h", False))
    monkeypatch.setattr(rev, "REPO", str(tmp_path))
    monkeypatch.setattr(sys, "argv", [
        "round_evidence.py", "--round", "97",
        "--steps", "drive_sf01,bench"])
    with pytest.raises(SystemExit) as ei:
        rev.main()
    assert ei.value.code == 0
    mpath = str(tmp_path / "ROUND_EVIDENCE_r97.json")
    assert rev.verify_manifest(mpath) == 0


def test_unknown_step_name_is_an_error(tmp_path, monkeypatch):
    """A typo in --steps/--skip/--redo must not silently drop a gate
    from the bundle."""
    monkeypatch.setattr(rev, "git_head", lambda: ("h", False))
    monkeypatch.setattr(rev, "REPO", str(tmp_path))
    monkeypatch.setattr(sys, "argv", [
        "round_evidence.py", "--round", "97",
        "--steps", "pytest,smoke_detla"])
    with pytest.raises(SystemExit) as ei:
        rev.main()
    assert ei.value.code == 2
