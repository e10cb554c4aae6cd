"""bench.py must survive per-query failures: one flaky query (round 3's
BENCH_r03 was rc=1 from a single transient streaming-state abort) may not
zero the whole perf artifact. Forced-failure contract (round 6: stdout is
the COMPACT line — full maps live in BENCH_full.json): a query that
raises is recorded in the full artifact's "errors" and named on the
compact line, every other query still gets timed, exactly one parseable
JSON line is printed, and the exit code is 0 while >=95% of queries
timed cleanly."""

from __future__ import annotations

import json
import types

import pytest

import bench


def _specs_with_bomb(spark):
    def ok(s, sf_dir):
        return s.range(10).selectExpr("id", "id * 2 AS twice")

    def boom(s, sf_dir):
        raise RuntimeError("injected flake (state store abort stand-in)")

    names = [f"ok_{i}" for i in range(20)]
    specs = {n: types.SimpleNamespace(fn=ok) for n in names}
    specs["boom_q"] = types.SimpleNamespace(fn=boom)
    return specs


def test_bench_survives_injected_failure(spark, monkeypatch, capsys,
                                         tmp_path):
    monkeypatch.setattr(bench, "FULL_PATH", str(tmp_path / "full.json"))
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "all_queries",
                        lambda: _specs_with_bomb(spark))
    monkeypatch.setattr(bench, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(
        bench.plans, "flagship",
        lambda s, d: s.range(5).selectExpr("id AS flag"))
    monkeypatch.setattr(spark, "stop", lambda: None)

    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 0  # 1 error out of 22 timings is < 5%

    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 1900  # fits the driver's 2000-char tail whole
    out = json.loads(line)  # ONE parseable JSON line no matter what
    assert out["metric"] == "suite_total_wall_clock"
    assert out["n_errors"] == 1 and out["error_names"] == ["boom_q"]
    assert out["n_queries"] == 22  # 20 ok + boom_q + flagship all timed
    full = json.loads((tmp_path / "full.json").read_text())
    assert "injected flake" in full["errors"]["boom_q"]
    assert "boom_q" in full["queries"]  # timed (fail-fast) but flagged
    assert "flagship_topk_revenue" in full["queries"]
    assert sum(1 for n in full["queries"] if n.startswith("ok_")) == 20


def test_bench_systemic_failure_exits_nonzero(spark, monkeypatch, capsys,
                                              tmp_path):
    def boom(s, sf_dir):
        raise RuntimeError("everything is broken")

    specs = {f"q{i}": types.SimpleNamespace(fn=boom) for i in range(10)}
    monkeypatch.setattr(bench, "FULL_PATH", str(tmp_path / "full.json"))
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "all_queries", lambda: specs)
    monkeypatch.setattr(bench, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(
        bench.plans, "flagship",
        lambda s, d: s.range(5).selectExpr("id AS flag"))
    monkeypatch.setattr(spark, "stop", lambda: None)

    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1  # systemic breakage must still scream

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_errors"] == 10
    full = json.loads((tmp_path / "full.json").read_text())
    assert len(full["errors"]) == 10


def test_bench_full_artifact_self_folds_min_of_runs(spark, monkeypatch,
                                                    capsys, tmp_path):
    """Round-7 verdict item 6: the committed BENCH_full.json must CONTAIN
    the min-of-N map the regression protocol gates on. Two consecutive
    runs fold (min per query, runs_folded=2, bounded history); a
    registry change (different query-name set) resets the fold; an
    errored timing never becomes a minimum."""
    full_path = tmp_path / "full.json"
    monkeypatch.setattr(bench, "FULL_PATH", str(full_path))
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(
        bench.plans, "flagship",
        lambda s, d: s.range(5).selectExpr("id AS flag"))
    monkeypatch.setattr(spark, "stop", lambda: None)
    monkeypatch.setattr(bench, "all_queries",
                        lambda: _specs_with_bomb(spark))

    for _ in range(2):
        with pytest.raises(SystemExit):
            bench.main()
    capsys.readouterr()
    full = json.loads(full_path.read_text())
    assert full["runs_folded"] == 2 and len(full["runs_history"]) == 2
    # min map = per-query min across both runs' clean timings
    r1, r2 = full["runs_history"]
    for name, v in full["queries_min_of_runs"].items():
        assert v == min(x for x in
                        (r1["queries"].get(name), r2["queries"].get(name))
                        if x is not None)
    # boom_q errored in BOTH runs -> its fail-fast timing is no minimum
    assert "boom_q" not in full["queries_min_of_runs"]
    assert "ok_0" in full["queries_min_of_runs"]

    # a registry change resets the fold instead of folding stale minima
    def ok(s, sf_dir):
        return s.range(3).selectExpr("id")
    monkeypatch.setattr(
        bench, "all_queries",
        lambda: {"renamed_q": types.SimpleNamespace(fn=ok)})
    with pytest.raises(SystemExit):
        bench.main()
    capsys.readouterr()
    full = json.loads(full_path.read_text())
    assert full["runs_folded"] == 1
    assert set(full["queries_min_of_runs"]) == {"renamed_q",
                                                "flagship_topk_revenue"}


def test_bench_compact_line_carries_min_of_runs(spark, monkeypatch,
                                                capsys, tmp_path):
    monkeypatch.setattr(bench, "FULL_PATH", str(tmp_path / "full.json"))
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(
        bench.plans, "flagship",
        lambda s, d: s.range(5).selectExpr("id AS flag"))
    monkeypatch.setattr(spark, "stop", lambda: None)
    monkeypatch.setattr(bench, "all_queries",
                        lambda: _specs_with_bomb(spark))
    with pytest.raises(SystemExit):
        bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 1900
    out = json.loads(line)
    assert out["runs_folded"] == 1
    assert out["min_of_runs_total"] > 0
