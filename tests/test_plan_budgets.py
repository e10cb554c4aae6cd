"""Engine-wide plan-budget lock: every lazily-built query's initial
physical plan must carry EXACTLY the golden number of shuffle and
broadcast exchanges (docs/plan_budgets.json). An extra shuffle from a
refactor is invisible to the correctness oracle and to bench noise at
sf0.1 — but it is 10x at scale; this test turns it into a red diff.
After an INTENDED plan change, regenerate with
``python docs/gen_plan_budgets.py`` and commit the new golden.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs"))

from zoom_etl_spark.registry import all_queries  # noqa: E402

_GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "plan_budgets.json")


def test_plan_budgets_hold(spark, sf_dir):
    from gen_plan_budgets import SKIP_PREFIXES, shuffle_profile

    golden = json.load(open(_GOLDEN))
    assert len(golden) > 140, "golden file truncated?"
    specs = all_queries()
    # two-sided (review finding): a query ADDED without regenerating the
    # golden must fail here too, or its budget is simply unenforced
    expected = {n for n in specs
                if not any(n.startswith(p) for p in SKIP_PREFIXES)}
    unpinned = expected - set(golden)
    assert not unpinned, (
        f"queries missing from docs/plan_budgets.json (regenerate): "
        f"{sorted(unpinned)}")
    regressions, missing = [], []
    for name, want in sorted(golden.items()):
        if name not in specs:
            missing.append(name)
            continue
        got = shuffle_profile(specs[name].fn(spark, sf_dir)._jdf)
        if got != want:
            regressions.append((name, want, got))
    assert not missing, f"golden names gone from registry: {missing}"
    assert not regressions, (
        "plan budgets regressed (regenerate docs/plan_budgets.json ONLY "
        f"if the change is intended): {regressions}")
