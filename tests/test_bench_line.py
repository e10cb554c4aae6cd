"""The driver captures only the last 2000 chars of bench.py stdout and
json-parses the final line; BENCH_r01..r05 all recorded `parsed: null`
because the full per-query map was one ~40 KB line. These gates pin the
round-6 contract: the stdout line is valid JSON, complete, and small."""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"))


def _compact_line():
    mod = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(mod)
    return mod.compact_line


def _full(n_queries: int, name_len: int = 30) -> dict:
    qs = {f"q{'x' * name_len}{i:04d}": i * 0.123 for i in range(n_queries)}
    return {"metric": "suite_total_wall_clock",
            "value": round(sum(qs.values()), 3), "unit": "sec",
            "queries": qs, "sf": 0.1, "cpus": 32, "n_queries": len(qs),
            "errors": {},
            "cost_totals_mb": {"inputBytes": 2627.2, "shuffleReadBytes": 869.9,
                               "shuffleWriteBytes": 847.3,
                               "memoryBytesSpilled": 0.0,
                               "diskBytesSpilled": 0.0}}


def test_compact_line_fits_driver_tail_and_parses():
    compact_line = _compact_line()
    line = compact_line(_full(307))
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["metric"] == "suite_total_wall_clock"
    assert d["n_queries"] == 307 and d["n_errors"] == 0
    assert len(d["queries"]) == 20
    # the 20 kept are the slowest ones
    assert min(d["queries"].values()) >= round(0.123 * (307 - 20), 2)


def test_compact_line_hard_guard_drops_queries_not_validity():
    compact_line = _compact_line()
    # adversarial: absurdly long query names blow past the budget —
    # the guard must drop the map, never emit an oversized line
    line = compact_line(_full(307, name_len=200))
    assert len(line) <= 1900
    d = json.loads(line)
    assert "queries" not in d
    assert d["n_queries"] == 307
