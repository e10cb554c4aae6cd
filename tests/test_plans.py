"""Plan-shape assertions — the 100 TB posture, locked in as tests:
filters reach the parquet scan, projections prune columns, bounded dims
broadcast, global top-N avoids a full sort, aggregates run partial
(map-side) first. A regression here is a scale bug even when results
stay correct."""

from __future__ import annotations

from pyspark.sql import functions as F

from zoom_etl_spark.registry import all_queries

_SPECS = all_queries()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_incremental_scan_pushes_predicate(spark, sf_dir):
    """The watermark comparison must reach the scan (on the raw nanos
    column — a filter above the timestamp conversion doesn't push)."""
    plan = _physical(_SPECS["incremental_scan"].fn(spark, sf_dir))
    assert "GreaterThanOrEqual(ts" in plan.split("PushedFilters: ")[1].split("\n")[0]


def test_project_users_prunes_columns(spark, sf_dir):
    plan = _physical(_SPECS["project_users"].fn(spark, sf_dir))
    # scan must read only the 4 projected source columns
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "c_custkey" in read_schema and "c_acctbal" in read_schema
    assert "c_nationkey" not in read_schema


def test_fk_enrich_broadcasts_bounded_dims(spark, sf_dir):
    plan = _physical(_SPECS["join_fk_enrich"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at least


def test_sort_limit_is_top_n_not_full_sort(spark, sf_dir):
    plan = _physical(_SPECS["sort_limit"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_group_stats_partial_aggregation(spark, sf_dir):
    plan = _physical(_SPECS["agg_group_stats"].fn(spark, sf_dir))
    assert "partial_" in plan  # map-side combine before the shuffle


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _physical(_SPECS["join_semi"].fn(spark, sf_dir))
    assert "LeftSemi" in plan


def test_interval_join_is_hash_not_bnl(spark, sf_dir):
    """The equi-anchor must keep the range join a hash join — a
    BroadcastNestedLoopJoin here would be quadratic at scale."""
    plan = _physical(_SPECS["join_interval"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_topk_no_shuffle_of_scores(spark, sf_dir):
    plan = _physical(_SPECS["similarity_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_point_lookup_broadcasts_keys_not_customer(spark, sf_dir):
    """The 5-key lookup set must be the broadcast build side; customer
    must never be shuffled or sorted to serve a point lookup. (The
    preserved side of a left join can't broadcast — the right-outer
    rewrite is what makes this plan legal.)"""
    plan = _physical(_SPECS["point_lookup_join"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan
    # customer reaches the join straight from its scan — no shuffle anywhere
    assert "Exchange hashpartitioning" not in plan


def test_aqe_coalesces_shuffle_partitions(spark, sf_dir):
    """AQE must shrink the 16 configured shuffle partitions for tiny
    aggregate outputs (the runtime re-plan the engine relies on at every
    scale) — visible as AQEShuffleRead(coalesced) in the final plan."""
    df = _SPECS["agg_count"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes the plan only on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan, plan[:600]


def test_no_cartesian_anywhere(spark, sf_dir):
    """No registered query may plan a cartesian product (the one allowed
    cross join — similarity_topk's broadcast of a 1-row query vector —
    plans as BroadcastNestedLoopJoin over 1 row, not CartesianProduct)."""
    offenders = []
    for name, spec in _SPECS.items():
        if name in ("stream_ingest", "sink_partitioned_write"):
            continue  # executes eagerly / writes files
        plan = _physical(spec.fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_chunk_documents_is_scan_shaped(spark, sf_dir):
    """Chunking must pipeline in the scan stage: no Exchange anywhere
    (an accidental shuffle would serialize the fan-out), and no inferred
    size()>0 filter duplicating the tokenizer into the scan (the
    InferFiltersFromGenerate exclusion, session.py)."""
    plan = _physical(_SPECS["chunk_documents"].fn(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "Generate explode" in plan
    pushed = plan.split("PushedFilters: ")[1].split("\n")[0]
    assert pushed.startswith("[]"), pushed


def test_decontaminate_probe_is_broadcast(spark, sf_dir):
    """The benchmark gram set must reach the corpus as a broadcast hash
    probe — a sort-merge join here would shuffle the full exploded
    corpus by gram, the exact failure mode the operator exists to
    avoid."""
    plan = _physical(_SPECS["decontaminate_ngram"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_asof_join_has_no_pair_join(spark, sf_dir):
    """The as-of join must be the union + forward-fill plan: a window
    over the merged timeline, never a join that materializes
    (left row x earlier right row) pairs."""
    plan = _physical(_SPECS["join_asof"].fn(spark, sf_dir))
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, f"{node} in asof plan"
    assert "Window" in plan and "Union" in plan


def test_mixture_stats_frame_broadcasts_back(spark, sf_dir):
    """The n_langs-row acceptance-rate frame must broadcast back to the
    corpus — shuffling the corpus by lang to meet a 20-row dim would be
    the skewed-key anti-pattern."""
    plan = _physical(_SPECS["mixture_temperature_sample"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_queries_survive_non_utc_driver_session(spark, sf_dir):
    """The driver owns its session and may hand us any timezone;
    configure() must coerce to UTC at query-build time so timestamp
    semantics (and oracle parity) hold regardless (verify-skill probe)."""
    from tests.oracle_harness import compare, duck_connection

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        spec = _SPECS["window_tumbling"]
        con = duck_connection(sf_dir)
        try:
            report = compare(spec.fn(spark, sf_dir), con, spec.oracle)
        finally:
            con.close()
        assert report["ok"], report
        # and the session is back on UTC for everyone after configure()
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir):
    """On a date/status-partitioned fact layout, a selective dim filter
    must prune fact PARTITIONS at runtime (DPP) — the mechanism that
    turns a 100 TB scan into a few-partition scan when the dim side is
    filtered. Locked in as a plan gate: the fact scan carries a
    dynamicpruning subquery on the partition column."""
    import tempfile

    from zoom_etl_spark.catalog import table

    out = tempfile.mkdtemp(prefix="zes_dpp_") + "/orders_part"
    o = table(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    fact = spark.read.parquet(out)
    dim = (spark.createDataFrame([("F", "finished")], "st string, label string")
           .filter(F.col("label") == "finished"))
    joined = (fact.join(dim.hint("broadcast"), fact.o_orderstatus == dim.st)
              .select("o_orderkey", "label"))
    plan = _physical(joined)
    assert "dynamicpruning" in plan.lower(), plan
    # and the result only reads the F partition
    assert joined.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_band_join_is_hash_not_bnl(spark, sf_dir):
    """The anchor-free payload-carrying band join must plan as a hash
    join on the manufactured bin key — never the O(n^2)
    BroadcastNestedLoopJoin the bare band predicate degenerates to.
    (The registered join_band_dates query is count-only and plans as
    aggregate pushdown instead — this gate pins the general operator.)"""
    from zoom_etl_spark.operators.joins import band_join
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    day = F.unix_date(F.to_date("o_orderdate"))
    a = o.select(F.col("o_orderkey").alias("order_id"), day.alias("day_a"))
    b = o.select(F.col("o_orderkey").alias("okb"), day.alias("day_b"))
    plan = _physical(band_join(a, b, "day_a", "day_b", band=1))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_aqe_skew_join_splits_hot_partition(spark):
    """Planted hot key (90% of the left side) + production-shaped skew
    thresholds scaled to test data: AQE must mark the sort-merge join
    skew=true — the hot partition is split across tasks instead of
    serializing one straggler — and the result must equal the plain
    join. This is the built-in half of the skew story (operators/
    joins.py::auto_join is the explicit-salting half for engines/joins
    AQE can't reach)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "131072",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16384",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 220000).select(
            F.when(F.col("id") < 200000, F.lit(1)).otherwise(F.col("id"))
            .alias("k"), F.col("id").alias("v"))
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = left.join(right, "k")
        # execute THIS dataset so its AQE plan finalizes (count() would
        # plan a separate query and leave j's plan isFinalPlan=false)
        n = len(j.collect())
        assert n == 200000  # only the hot key overlaps the right side
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_sample_weighted_is_top_k_heap_no_exchange(spark, sf_dir):
    """Priority sampling must be TakeOrderedAndProject over the scan —
    per-partition top-k heaps merged on the driver, zero shuffles."""
    plan = _physical(_SPECS["sample_weighted"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_bm25_no_corpus_join_for_doc_length(spark, sf_dir):
    """Document length must ride through the tf aggregate as a grouping
    key, not come from a second corpus-sized join: the only joins in the
    plan are the broadcast df/avgdl sides, and ranking is a top-k heap."""
    plan = _physical(_SPECS["bm25_search"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_time_weighted_avg_reuses_user_partitioning(spark, sf_dir):
    """The lead() window and the final groupBy both key on user_id — the
    aggregate must reuse the window's exchange, leaving exactly one
    user-keyed shuffle in the plan."""
    plan = _physical(_SPECS["time_weighted_avg"].fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_joint_calibrate_grid_is_broadcast(spark, sf_dir):
    """The 9-cell policy grid must broadcast into the corpus-side
    conditional aggregation — the corpus never shuffles for the grid."""
    plan = _physical(_SPECS["curation_joint_calibrate"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_analyze_stats_branches_prune_to_single_column(spark, sf_dir):
    """Every profile branch must read exactly its own column (pruned
    ReadSchema) and the plan must contain no Expand (the multi-distinct
    rewrite this query deliberately avoids)."""
    plan = _physical(_SPECS["analyze_table_stats"].fn(spark, sf_dir))
    assert "Expand" not in plan
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan
    assert "ReadSchema: struct<l_returnflag:string>" in plan


def test_hybrid_search_rerank_is_broadcast_probe(spark, sf_dir):
    """The dense rerank must probe the embedding table via a BROADCAST
    of the 50 lexical candidates — never shuffle the embedding corpus."""
    plan = _physical(_SPECS["pipeline_hybrid_search"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """The 100 TB join posture when the dim side is too big to broadcast:
    Catalyst's runtime bloom filter (SPARK-32268) must inject a
    might_contain pre-filter on the fact scan side of a shuffle join,
    cutting shuffled fact rows to ~the join's selectivity before the
    exchange. Not enabled engine-wide here — at bench scale the extra
    filter-creation subquery costs more than the pruned shuffle saves —
    but a deployment flips exactly these thresholds, so the capability
    is locked in as a plan gate (+ result equality vs the plain join)."""
    cfg = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in cfg}
    try:
        for k, v in cfg.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
             .filter(F.col("o_orderpriority") == "1-URGENT"))
        j = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
               .groupBy("o_orderpriority")
               .agg(F.count("*").alias("n")))
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # result equality against the untouched-config plain join
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .filter(F.col("o_orderpriority") == "1-URGENT"))
    plain = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
               .groupBy("o_orderpriority").agg(F.count("*").alias("n"))
               .collect())
    assert sorted(map(tuple, rows)) == sorted(map(tuple, plain))


def test_geo_neighbor_join_is_cell_blocked(spark, sf_dir):
    """The spatial neighbor join must be an equi-join on the cell key
    with the distance as residual — never a nested-loop over all
    pairs."""
    plan = _physical(_SPECS["geo_neighbor_pairs"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan[:800]
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_range_lookup_join_is_equi_not_nested_loop(spark, sf_dir):
    """join_range_lookup's bucket decomposition must plan as a shuffled
    (or broadcast-HASH) equi-join with the range predicate residual —
    never BroadcastNestedLoop or CartesianProduct, which is what the
    bare BETWEEN theta-join degenerates to."""
    from zoom_etl_spark.registry import all_queries

    plan = (all_queries()["join_range_lookup"].fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan, plan
    # the blocks<->lookups join must be a HASH join keyed on the
    # bucket with the range predicate residual on the same node
    join_lines = [ln for ln in plan.splitlines()
                  if "owner" in ln and "div 1000" in ln
                  and ("HashJoin" in ln or "SortMergeJoin" in ln)]
    assert join_lines, plan
    assert all("start_addr" in ln and "end_addr" in ln
               for ln in join_lines), join_lines
    # the only nested-loop allowed is the 1-row space-constant attach
    bnl = [ln for ln in plan.splitlines() if "BroadcastNestedLoop" in ln]
    assert len(bnl) <= 1, plan
