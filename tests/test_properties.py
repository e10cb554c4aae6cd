"""Property-based tests (hypothesis) for the upsert/merge core — SURVEY §5:
sequential batch merges must equal single-pass last-wins for ANY batch
split and ANY key/version distribution, and replay must be idempotent."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from zoom_etl_spark.operators.merge import merge_upsert
from zoom_etl_spark.operators.windows import last_wins

# rows: (key, version, payload); small key space forces collisions
ROWS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 20), st.integers(0, 1000)),
    min_size=0, max_size=40)
SPLITS = st.integers(1, 4)


def _expected(rows):
    """Reference semantics in plain Python: per key, the (version, payload)
    max wins (payload as the deterministic tiebreaker)."""
    best = {}
    for k, v, p in rows:
        if k not in best or (v, p) > best[k]:
            best[k] = (v, p)
    return {(k, v, p) for k, (v, p) in best.items()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS, n_batches=SPLITS)
def test_sequential_merge_equals_last_wins(spark, rows, n_batches):
    """Upserts are arrival-order-wins; they equal version-based last-wins
    exactly when batches arrive in version order (real streams: batches
    cut by event time). So: sort, split arbitrarily, merge sequentially
    → must equal global last-wins for ANY data and ANY split."""
    if not rows:
        return
    rows = sorted(rows, key=lambda r: (r[1], r[2]))  # arrival ≡ version order
    schema = "k int, ver int, payload int"
    size = max(1, len(rows) // n_batches)
    state = None
    for i in range(0, len(rows), size):
        batch = spark.createDataFrame(rows[i:i + size], schema)
        deduped = last_wins(batch, keys=["k"],
                            version=[F.col("ver"), F.col("payload")])
        state = deduped if state is None else merge_upsert(state, deduped, keys=["k"])
    got = {tuple(r) for r in state.collect()}
    assert got == _expected(rows)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS)
def test_merge_replay_idempotent(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "k int, ver int, payload int")
    deduped = last_wins(df, keys=["k"], version=[F.col("ver"), F.col("payload")])
    once = merge_upsert(deduped, deduped, keys=["k"])
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in deduped.collect()}
