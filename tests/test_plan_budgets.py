"""Engine-wide plan-budget lock: every lazily-built query's initial
physical plan must carry EXACTLY the golden number of shuffle and
broadcast exchanges (docs/plan_budgets.json), and every OTHER query
must carry a one-line exclusion reason in the same golden file — the
"budgets" and "excluded" sections must partition the registry exactly
(round-7 verdict item 5), so a new query chooses a side the day it
lands. An extra shuffle from a refactor is invisible to the
correctness oracle and to bench noise at sf0.1 — but it is 10x at
scale; this test turns it into a red diff. After an INTENDED plan
change, regenerate with ``python docs/gen_plan_budgets.py`` and commit
the new golden.
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


def test_budgets_and_exclusions_partition_the_registry_exactly():
    from gen_plan_budgets import EXCLUDED

    golden = json.load(open(_GOLDEN))
    budgets, excluded = golden["budgets"], golden["excluded"]
    assert len(budgets) > 140, "golden file truncated?"
    # the committed exclusion ledger is the generator's, verbatim
    assert excluded == EXCLUDED, (
        "docs/plan_budgets.json 'excluded' drifted from "
        "gen_plan_budgets.EXCLUDED — regenerate")
    names = set(all_queries())
    overlap = set(budgets) & set(excluded)
    assert not overlap, f"pinned AND excluded: {sorted(overlap)}"
    unaccounted = names - set(budgets) - set(excluded)
    assert not unaccounted, (
        f"queries neither pinned nor excluded-with-reason (add to the "
        f"golden, or to EXCLUDED with a one-line reason): "
        f"{sorted(unaccounted)}")
    gone = (set(budgets) | set(excluded)) - names
    assert not gone, f"golden names no longer in registry: {sorted(gone)}"
    assert all(isinstance(r, str) and len(r) > 20
               for r in excluded.values()), "empty exclusion reason"


def test_plan_budgets_hold(spark, sf_dir):
    from gen_plan_budgets import shuffle_profile

    budgets = json.load(open(_GOLDEN))["budgets"]
    specs = all_queries()
    regressions = []
    for name, want in sorted(budgets.items()):
        got = shuffle_profile(specs[name].fn(spark, sf_dir)._jdf)
        if got != want:
            regressions.append((name, want, got))
    assert not regressions, (
        "plan budgets regressed (regenerate docs/plan_budgets.json ONLY "
        f"if the change is intended): {regressions}")
