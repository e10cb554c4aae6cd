"""DAG-runner semantics vs the reference's Airflow behavior (reference
airflow/dags/etl_process.py:30-31 retries, :188/:202 dynamic mapping;
src/errors/error_handler.py:107-147 per-category routing): deterministic
topological order, retry-with-backoff on a virtual clock, downstream
skip on branch failure with independent branches unharmed, category
routing, resume-from-ledger, and chunked task expansion."""

from __future__ import annotations

import pytest

from zoom_etl_spark.orchestrate import (CycleError, Pipeline, Task,
                                        categorize, chunked, expand)


def _clock():
    slept = []
    return slept, slept.append


def test_topological_deterministic_order_and_values_flow():
    seen = []

    def mk(name):
        def fn(**deps):
            seen.append(name)
            return f"{name}:{sorted(deps.values())}"
        return fn

    tasks = [Task("c", mk("c"), deps=("a", "b")),
             Task("a", mk("a")), Task("b", mk("b"), deps=("a",))]
    res = Pipeline(tasks, sleep=lambda s: None).run()
    assert seen == ["a", "b", "c"]
    assert res["c"].value == "c:['a:[]', \"b:['a:[]']\"]"
    assert all(r.status == "ok" for r in res.values())


def test_retry_backoff_then_success():
    slept, sleep = _clock()
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("HTTP 429 rate limited")
        return "ok"

    res = Pipeline([Task("t", flaky, retries=3, retry_delay_s=300.0)],
                   sleep=sleep).run()
    assert res["t"].status == "ok" and res["t"].attempts == 3
    assert slept == [300.0, 600.0]  # reference delay * 2^(n-1)


def test_branch_failure_skips_downstream_only(capsys):
    routed = []

    def boom():
        raise TimeoutError("zoom api timed out")

    p = Pipeline([
        Task("ext", boom, retries=1, retry_delay_s=0.0,),
        Task("load", lambda **d: "loaded", deps=("ext",)),
        Task("other", lambda: "fine"),
        Task("report", lambda **d: "r", deps=("load", "other")),
    ], sleep=lambda s: None)
    p.route_to("timeout", routed.append)
    res = p.run()
    assert res["ext"].status == "failed" and res["ext"].attempts == 2
    assert res["ext"].category == "timeout"
    assert res["load"].status == "skipped"
    assert res["report"].status == "skipped"  # transitive
    assert res["other"].status == "ok"        # independent branch ran
    assert [r.name for r in routed] == ["ext"]


def test_resume_skips_completed_and_reruns_failed():
    attempts = {"flaky": 0}

    def expensive():
        attempts.setdefault("exp", 0)
        attempts["exp"] += 1
        return "data"

    def flaky(**deps):
        attempts["flaky"] += 1
        if attempts["flaky"] == 1:
            raise ValueError("schema validation failed")
        return "clean"

    p = Pipeline([Task("expensive", expensive),
                  Task("flaky", flaky, deps=("expensive",), retries=0),
                  Task("sink", lambda **d: d["flaky"], deps=("flaky",))],
                 sleep=lambda s: None)
    r1 = p.run()
    assert r1["flaky"].status == "failed"
    assert r1["flaky"].category == "data_validation"
    assert r1["sink"].status == "skipped"
    r2 = p.run(resume=True)
    assert attempts["exp"] == 1               # ledger: not recomputed
    assert r2["expensive"].status == "cached"
    assert r2["flaky"].status == "ok"
    assert r2["sink"].value == "clean"


def test_cycle_and_unknown_deps_raise():
    with pytest.raises(CycleError):
        Pipeline([Task("a", lambda: 1, deps=("b",)),
                  Task("b", lambda: 1, deps=("a",))])
    with pytest.raises(ValueError, match="undeclared"):
        Pipeline([Task("a", lambda: 1, deps=("ghost",))])


def test_chunked_and_expand_isolate_chunk_failures():
    chunks = chunked(range(25), chunk_size=10)
    assert [len(c) for c in chunks] == [10, 10, 5]

    def work(chunk):
        if 13 in chunk:
            raise RuntimeError("resource not found: 404")
        return sum(chunk)

    tasks = expand("proc", work, chunks, retries=0)
    res = Pipeline(tasks, sleep=lambda s: None).run()
    assert res["proc[0]"].status == "ok" and res["proc[0]"].value == 45
    assert res["proc[1]"].status == "failed"
    assert res["proc[1]"].category == "resource_not_found"
    assert res["proc[2]"].status == "ok"      # later chunks unharmed


def test_expand_with_deps_swallows_upstream_values():
    """Regression (round-4 advice): expand()ed chunk tasks with deps
    used to TypeError on the dep kwargs the runner injects, burning
    every retry with its full backoff sleep."""
    slept, sleep = _clock()
    tasks = [Task("up", lambda: "ready")] + expand(
        "w", sum, chunked([1, 2, 3, 4], chunk_size=2),
        deps=("up",), retries=2, retry_delay_s=300.0)
    res = Pipeline(tasks, sleep=sleep).run()
    assert res["w[0]"].status == "ok" and res["w[0]"].value == 3
    assert res["w[1]"].status == "ok" and res["w[1]"].value == 7
    assert res["w[0]"].attempts == 1 and slept == []  # no retry burned


def test_resume_is_idempotent_across_repeated_resumes():
    """Regression (round-4 advice): a second resume used to re-execute
    work the first resume marked 'cached' — ledger contract says
    completed work stays skipped on every subsequent resume."""
    runs = {"a": 0}

    def a():
        runs["a"] += 1
        return "v"

    p = Pipeline([Task("a", a)], sleep=lambda s: None)
    p.run()
    p.run(resume=True)
    r3 = p.run(resume=True)
    assert runs["a"] == 1
    assert r3["a"].status == "cached" and r3["a"].value == "v"


def test_expand_dep_named_c_cannot_shadow_the_chunk():
    """Regression (round-5 review): a default-arg chunk binding let an
    upstream dep literally named 'c' REBIND the chunk parameter — the
    task then silently processed the dep's return value as its chunk,
    reporting ok. The closure binding has no parameter to collide."""
    tasks = [Task("c", lambda: "ready")] + expand(
        "w", sum, chunked([1, 2, 3, 4], chunk_size=2),
        deps=("c",), retries=0)
    res = Pipeline(tasks, sleep=lambda s: None).run()
    assert res["w[0]"].status == "ok" and res["w[0]"].value == 3
    assert res["w[1]"].status == "ok" and res["w[1]"].value == 7


def test_declared_general_category_also_wins():
    """Regression (round-5 review): with 'general' doubling as the
    undeclared sentinel, an EXPLICIT category='general' was overridden
    by message sniffing; None is the sentinel now."""
    routed = []

    def boom():
        raise RuntimeError("connection reset by peer")  # sniffs 'api'

    p = Pipeline([Task("t", boom, retries=0, category="general")],
                 sleep=lambda s: None)
    p.route_to("general", routed.append)
    res = p.run()
    assert res["t"].category == "general"
    assert [r.name for r in routed] == ["t"]


def test_declared_category_wins_over_heuristic():
    """Regression (round-4 advice): an explicit Task(category=...) was
    ignored in favor of message sniffing, so route_to('api', sink)
    never fired unless the exception text matched a needle."""
    routed = []

    def boom():
        raise RuntimeError("opaque upstream wobble")  # sniffs 'general'

    p = Pipeline([Task("t", boom, retries=0, category="api")],
                 sleep=lambda s: None)
    p.route_to("api", routed.append)
    res = p.run()
    assert res["t"].category == "api"
    assert [r.name for r in routed] == ["t"]
    # default-category tasks still use the heuristic
    p2 = Pipeline([Task("t", lambda: (_ for _ in ()).throw(
        TimeoutError("timed out")), retries=0)], sleep=lambda s: None)
    assert p2.run()["t"].category == "timeout"


def test_categorize_taxonomy():
    assert categorize(PermissionError("401 unauthorized")) \
        == "authentication"
    assert categorize(RuntimeError("database connection refused")) \
        == "database"
    assert categorize(Exception("weirdness")) == "general"


def test_end_to_end_with_spark_and_alert_sink(spark, sf_dir):
    """The binding actually carries engine work: extract (REST source)
    → chunk → per-chunk Spark counts → merge, with a failure-injected
    chunk routed to an AlertRouter-style sink."""
    from zoom_etl_spark.sources import rest
    rest.register(spark)
    alerts = []

    def extract():
        df = (spark.read.format("paginated_rest")
              .option("nkeys", 8).option("numpartitions", 2).load())
        return [r.key for r in df.select("key").distinct().collect()]

    def count_chunk(chunk):
        df = (spark.read.format("paginated_rest")
              .option("nkeys", 8).option("numpartitions", 2).load())
        return df.filter(df.key.isin([int(k) for k in chunk])).count()

    keys_task = Task("keys", extract)
    res0 = Pipeline([keys_task], sleep=lambda s: None).run()
    chunks = chunked(sorted(res0["keys"].value), chunk_size=3)
    tasks = [keys_task] + expand("cnt", count_chunk, chunks,
                                 deps=(), retries=0)
    tasks.append(Task("total", lambda: None))
    p = Pipeline(tasks, sleep=lambda s: None).route_to("*", alerts.append)
    res = p.run()
    counts = [res[f"cnt[{i}]"].value for i in range(len(chunks))]
    assert sum(counts) > 0 and all(r.status == "ok" for r in res.values())
    assert alerts == []
