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


# (key, ts) event rows for join-operator properties; tiny key space and
# tight ts range force every edge: ties, empty sides, multi-match
LEFT_ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30)),
    min_size=0, max_size=25)
RIGHT_ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 99)),
    min_size=0, max_size=25)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=LEFT_ROWS, right=RIGHT_ROWS)
def test_asof_join_matches_bruteforce(spark, left, right):
    """asof_join (union + forward-fill formulation) must agree with the
    obvious O(n·m) reference for ANY key/timestamp distribution: per
    left row, the right row with max right_ts <= ts; ties broken by max
    payload; how='left' keeps unmatched rows with NULL."""
    from zoom_etl_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long")
    rdf = spark.createDataFrame(right, "k long, rts long, payload long")
    out = asof_join(ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
                    right_cols=["payload"],
                    tiebreak=[F.col("r.payload").desc()], how="left")
    got = {(r.lid, r.asof_payload) for r in out.collect()}

    want = set()
    for i, (k, t) in enumerate(left):
        cands = [(rt, p) for (rk, rt, p) in right if rk == k and rt <= t]
        best = max(cands, key=lambda x: (x[0], x[1]))[1] if cands else None
        want.add((i, best))
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=LEFT_ROWS, right=RIGHT_ROWS)
def test_band_join_matches_bruteforce(spark, left, right):
    """band_join (bin equi-key + residual filter) must emit EXACTLY the
    pairs with |l.ts - r.rts| <= width for ANY distribution — the
    binning is a pure plan rewrite, never a semantics change."""
    from zoom_etl_spark.operators.joins import band_join

    WIDTH = 5
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long")
    rdf = spark.createDataFrame(
        [(k, t, 1000 + i) for i, (k, t, _p) in enumerate(right)],
        "k long, rts long, rid long")
    out = band_join(ldf, rdf, left_val="ts", right_val="rts", band=WIDTH)
    got = {(r.lid, r.rid) for r in out.collect()}

    want = {(i, 1000 + j)
            for i, (_lk, t) in enumerate(left)
            for j, (_rk, rt, _p) in enumerate(right)
            if abs(t - rt) <= WIDTH}
    assert got == want


# ------------------------------------------------------- merge_into model

_MI_ROWS = st.lists(
    st.tuples(st.integers(0, 9),                     # key
              st.sampled_from(["F", "O", "P"]),      # status
              st.integers(0, 99)),                   # price (int: exact)
    min_size=0, max_size=12)


def _mi_model(target, source, upd_first):
    """Pure-Python MERGE model: clauses = [delete if status=='F',
    update price] in the given order, unconditional insert. Source is
    pre-deduped on key (ambiguity is its own test)."""
    smap = {k: (s_, p) for k, s_, p in source}
    out = []
    for k, status, price in target:
        if k in smap:
            if upd_first:
                out.append((k, status, smap[k][1]))       # update wins
            elif status == "F":
                continue                                   # deleted
            else:
                out.append((k, status, smap[k][1]))
        else:
            out.append((k, status, price))
    tkeys = {k for k, _, _ in target}
    out += [(k, s_, p) for k, (s_, p) in
            ((k, v) for k, v in smap.items()) if k not in tkeys]
    return sorted(out)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(target=_MI_ROWS, source=_MI_ROWS, upd_first=st.booleans())
def test_merge_into_matches_model(spark, target, source, upd_first):
    """merge_into ≡ the row-by-row SQL-standard model for arbitrary
    target/source/clause-order combinations (first-clause-wins, delete
    on F, all-source insert). Source deduped on key: the ambiguity path
    raises by contract and has its own test."""
    from zoom_etl_spark.operators.merge import merge_into
    seen = set()
    source = [r for r in source
              if r[0] not in seen and not seen.add(r[0])]
    # de-dup target keys too: a real target has unique merge keys
    tseen = set()
    target = [r for r in target
              if r[0] not in tseen and not tseen.add(r[0])]
    schema = "k int, status string, price int"
    t = spark.createDataFrame(target, schema)
    s = spark.createDataFrame(source, schema)
    clauses = [("delete", F.col("t.status") == "F", None),
               ("update", None, {"price": F.col("s.price")})]
    if upd_first:
        clauses = clauses[::-1]
    out = merge_into(t, s, ["k"], matched=clauses, not_matched_insert=True)
    got = sorted(tuple(r) for r in out.collect())
    assert got == _mi_model(target, source, upd_first)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=LEFT_ROWS, right=RIGHT_ROWS)
def test_asof_directions_match_bruteforce(spark, left, right):
    """forward and nearest directions must agree with their O(n·m)
    definitions for ANY distribution: forward = min right_ts >= ts,
    nearest = min |Δ| with exact ties preferring the backward match;
    ties at one timestamp break by max payload in all directions."""
    from zoom_etl_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k long, ts long, lid long")
    rdf = spark.createDataFrame(right, "k long, rts long, payload long")

    def run(direction):
        out = asof_join(ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
                        right_cols=["payload"],
                        tiebreak=[F.col("r.payload").desc()], how="left",
                        direction=direction)
        return {(r.lid, r.asof_payload) for r in out.collect()}

    # dedupe right to one winner (max payload) per (k, rts), as the
    # operator's tiebreak does
    best_at = {}
    for (rk, rt, p) in right:
        if (rk, rt) not in best_at or p > best_at[(rk, rt)]:
            best_at[(rk, rt)] = p

    want_f, want_n = set(), set()
    for i, (k, t) in enumerate(left):
        cand = [(rt, p) for (rk, rt), p in best_at.items() if rk == k]
        fwd = [(rt, p) for rt, p in cand if rt >= t]
        want_f.add((i, min(fwd)[1] if fwd else None))
        if cand:
            d = min(abs(rt - t) for rt, _ in cand)
            exact = [(rt, p) for rt, p in cand if abs(rt - t) == d]
            want_n.add((i, min(exact)[1]))  # earlier rt = backward pref
        else:
            want_n.add((i, None))
    assert run("forward") == want_f
    assert run("nearest") == want_n
