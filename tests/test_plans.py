"""Physical-plan assertions (SURVEY.md §4): correctness tests prove the
rows; these prove the SCALE posture — pushdown, pruning, broadcast,
partial aggregation, top-k without global sort.
"""

from __future__ import annotations

from classification_problem_with_pyspark_spark.plans.explain import (
    assert_in_plan,
    formatted_plan,
    pushed_filters,
    read_schemas,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from tests.conftest import SF_DIR

load_all_modules()


def test_flagship_filter_pushdown_and_pruning(spark):
    df = QUERIES["agg_pricing_summary"].fn(spark, SF_DIR)
    pf = pushed_filters(df)
    assert "l_shipdate" in pf, f"shipdate filter not pushed: {pf}"
    rs = read_schemas(df)
    # Column pruning: the 11-column lineitem scan must read only the 7
    # referenced columns — no l_orderkey/l_partkey/l_suppkey.
    assert "l_orderkey" not in rs and "l_partkey" not in rs, rs


def test_filter_compound_pushdown(spark):
    df = QUERIES["filter_compound"].fn(spark, SF_DIR)
    pf = pushed_filters(df)
    for col in ("l_quantity", "l_returnflag", "l_discount"):
        assert col in pf, f"{col} not pushed: {pf}"


def test_dim_join_broadcasts(spark):
    df = QUERIES["join_broadcast_dim"].fn(spark, SF_DIR)
    assert_in_plan(df, "BroadcastHashJoin")


def test_semi_and_anti_join_shapes(spark):
    semi = formatted_plan(QUERIES["join_semi"].fn(spark, SF_DIR))
    anti = formatted_plan(QUERIES["join_anti"].fn(spark, SF_DIR))
    assert "LeftSemi" in semi, semi
    assert "LeftAnti" in anti, anti


def test_aggregation_is_partial_before_exchange(spark):
    plan = formatted_plan(QUERIES["agg_pricing_summary"].fn(spark, SF_DIR))
    assert "partial_sum" in plan and "partial_count" in plan, plan
    assert "Exchange" in plan, plan
    # Map-side combine must run BEFORE the shuffle: in formatted detail
    # sections, node ids ascend leaf→root, so the HashAggregate whose
    # Functions are partial_* must carry a lower id than the Exchange.
    # (ADVICE r3: the old disjunction here was vacuously true.)
    import re

    sections = re.split(r"^\((\d+)\)\s+", plan, flags=re.M)
    partial_ids = [
        int(sections[i])
        for i in range(1, len(sections) - 1, 2)
        if "partial_sum" in sections[i + 1]
    ]
    exchange_ids = [
        int(sections[i])
        for i in range(1, len(sections) - 1, 2)
        if sections[i + 1].startswith("Exchange")
    ]
    assert partial_ids, f"no partial-agg detail section found:\n{plan}"
    assert exchange_ids, f"no Exchange detail section found:\n{plan}"
    assert min(partial_ids) < min(exchange_ids), (
        f"partial agg (node {min(partial_ids)}) does not precede the shuffle "
        f"(node {min(exchange_ids)}):\n{plan}"
    )


def test_topk_plans_take_ordered(spark):
    plan = formatted_plan(QUERIES["topk_revenue"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_whole_stage_codegen_on_hot_path(spark):
    plan = formatted_plan(QUERIES["computed_column"].fn(spark, SF_DIR))
    # formatted mode marks codegen'd operators with "[codegen id : N]"
    assert "codegen id" in plan, plan


def test_range_join_broadcasts_interval_side(spark):
    plan = formatted_plan(QUERIES["join_range_events"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_langid_and_quality_are_shuffle_free(spark):
    # Per-document scoring is a pure narrow projection: one scan, zero
    # exchanges — the shape that scales embarrassingly at 100 TB.
    for key in ("llm_langid", "llm_quality_score"):
        plan = formatted_plan(QUERIES[key].fn(spark, SF_DIR))
        assert "Exchange" not in plan, f"{key} shuffles:\n{plan}"
        assert "codegen id" in plan, plan


def test_fingerprint_aggregates_map_side(spark):
    # The rolling-hash groupBy must partial-aggregate before its single
    # exchange on doc_id (map-side combine of per-token contributions).
    plan = formatted_plan(QUERIES["llm_fingerprint"].fn(spark, SF_DIR))
    assert "partial_sum" in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_text_scoring_reads_only_needed_columns(spark):
    # documents has 5 columns; quality scoring touches 3 — text/source
    # must be pruned from what the scan materializes where unused.
    from classification_problem_with_pyspark_spark.plans.explain import read_schemas

    rs = read_schemas(QUERIES["llm_lang_report"].fn(spark, SF_DIR))
    assert "text" not in rs, rs  # the big column stays on disk


def test_5way_join_broadcasts_all_dims(spark):
    plan = formatted_plan(QUERIES["join_5way_regional_revenue"].fn(spark, SF_DIR))
    # 4 broadcast joins (region⋈nation pre-joined, customer, supplier) and
    # exactly ONE shuffle join pair: orders⋈lineitem on orderkey.
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    # fact partitioned by event_type; joining a FILTERED tiny dim on the
    # partition column must inject a dynamicpruning subquery into the scan
    # so only matching partitions are read — the mechanism that saves a
    # 100-TB scan when the dim filter is selective.
    from pyspark.sql import functions as F

    from classification_problem_with_pyspark_spark.sources.catalog import load, write_parquet

    fact_dir = str(tmp_path / "events_part")
    write_parquet(load(spark, SF_DIR, "events"), fact_dir, partition_by=("event_type",))
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 2.0), ("signup", 0.1), ("error", 0.0)],
        ["event_type", "weight"],
    ).where(F.col("weight") > 1.5)  # selective: only 'purchase' survives
    joined = fact.join(dim, "event_type").groupBy("event_type").count()
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan


def test_limit_offset_plans_take_ordered(spark):
    # pagination must NOT materialize a global sort: Spark folds
    # offset+limit into one TakeOrderedAndProject (per-partition top-20).
    plan = formatted_plan(QUERIES["sort_limit_offset"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "GlobalLimit" not in plan or "TakeOrderedAndProject" in plan, plan


def test_similarity_numpy_is_single_python_stage(spark):
    # exactly one Arrow/Python boundary: the mapInPandas itself; selecting
    # top-5 inside the worker means no window/exchange over the N² pairs.
    plan = formatted_plan(QUERIES["llm_similarity_topk"].fn(spark, SF_DIR))
    # formatted mode lists each node twice (tree line + detail block)
    assert plan.count("MapInPandas") == 2, plan
    assert "Window" not in plan, plan
    # the Arrow boundary must carry only (vec_id, embedding), not label
    assert "label" not in plan.split("MapInPandas")[1], plan


def test_corr_covar_aggregates_map_side(spark):
    # the five moments must partial-aggregate before the exchange: the
    # shuffle carries 5 decimals per group, not 600k rows.
    plan = formatted_plan(QUERIES["agg_corr_covar"].fn(spark, SF_DIR))
    assert "partial" in plan.lower(), plan


def test_zscore_broadcasts_moment_rows(spark):
    # joining 5 moment rows back onto the events scan must broadcast, not
    # shuffle the fact side.
    plan = formatted_plan(QUERIES["events_anomaly_zscore"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_q6_scan_is_fully_pushed_and_pruned(spark):
    # TPC-H Q6 shape: the date range and quantity bound must reach the
    # parquet scan, and only the 4 referenced columns may be read — at
    # 100 TB this is the difference between a row-group-pruned scan and a
    # full-table read.
    df = QUERIES["filter_scan_agg_revenue"].fn(spark, SF_DIR)
    pf = pushed_filters(df)
    assert "l_shipdate" in pf and "l_quantity" in pf, pf
    rs = read_schemas(df)
    assert "l_orderkey" not in rs and "l_partkey" not in rs, rs


def test_promo_and_disjunctive_joins_broadcast_part(spark):
    # part is the dimension side in both Q14- and Q19-shaped joins; the
    # fact side must never shuffle for the join.
    for key in ("join_promo_share", "filter_disjunctive_join"):
        plan = formatted_plan(QUERIES[key].fn(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, f"{key}:\n{plan}"
        assert "SortMergeJoin" not in plan, f"{key} shuffles the fact:\n{plan}"


def test_global_share_broadcasts_total_row(spark):
    # the 1-row global total must broadcast back onto the per-supplier
    # rollup (Q11 shape) — no second fact scan, no shuffle of the rollup.
    plan = formatted_plan(QUERIES["agg_having_global_share"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_q18_inner_having_semi_joins(spark):
    # the IN-subquery over the HAVING aggregate must become a semi join
    # (tiny surviving key set), never a full join + distinct.
    plan = formatted_plan(QUERIES["subquery_in_agg_having"].fn(spark, SF_DIR))
    assert "LeftSemi" in plan, plan


def test_sink_partitioned_read_prunes(spark):
    # reading the event_type-partitioned sink with an event_type predicate
    # must prune at the directory level: the scan's partition filters name
    # the column, and the data filters do NOT re-apply it.
    df = QUERIES["sink_partitioned_roundtrip"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan, plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), plan


def test_hof_suite_is_shuffle_free_jvm_path(spark):
    # per-row array lambdas must stay inside the JVM (no Python boundary,
    # no exchange): one narrow projection over the embeddings scan.
    plan = formatted_plan(QUERIES["scalar_hof_suite"].fn(spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan


def test_minhash_aggregates_map_side(spark):
    # the 4 signature mins must partial-aggregate before the doc_id
    # shuffle: 4 longs per doc cross the wire, not every exploded token.
    plan = formatted_plan(QUERIES["llm_minhash_signatures"].fn(spark, SF_DIR))
    assert "partial_min" in plan, plan


def test_locf_window_partitions_by_user(spark):
    # the LOCF fill must partition by user_id — a global single-partition
    # window over 100 TB of events would serialize on one task.
    plan = formatted_plan(QUERIES["window_locf_fill"].fn(spark, SF_DIR))
    assert "hashpartitioning(user_id" in plan, plan


def test_nation_flow_single_fact_shuffle(spark):
    # Q7 shape: supplier/customer/nation broadcast; at most one
    # fact-to-fact shuffle join (lineitem⋈orders on orderkey).
    plan = formatted_plan(QUERIES["join_nation_flow"].fn(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan


def test_minhash_banding_never_cross_joins(spark):
    # LSH's whole point: candidates come from band-bucket EQUI-joins, so
    # the plan must not contain a nested-loop or cartesian product.
    plan = formatted_plan(QUERIES["llm_dedup_minhash_banded"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_min_per_group_broadcasts_back(spark):
    # Q2 shape: the per-type min table is group-count-sized and must
    # broadcast back onto the part scan, not shuffle it.
    plan = formatted_plan(QUERIES["join_back_min_per_group"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_runtime_bloom_filter_injects_on_shuffle_join(spark):
    """With broadcast disabled (the 100-TB fact⋈fact regime), Spark's
    runtime row-level filtering must inject a bloom_filter_agg built from
    the selective side and a might_contain probe on the scan side —
    cutting shuffle traffic before the exchange."""
    from pyspark.sql import functions as F

    from classification_problem_with_pyspark_spark.sources.catalog import load

    conf = spark.conf
    saved_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved_thr = conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        li = load(spark, SF_DIR, "lineitem")
        o = load(spark, SF_DIR, "orders").where(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bc)
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            saved_thr,
        )


def test_multi_distinct_plans_single_expand(spark):
    """agg_multi_distinct must resolve its three DISTINCT clauses via one
    Expand node (single shuffle round), not separate aggregation jobs."""
    plan = formatted_plan(QUERIES["agg_multi_distinct"].fn(spark, SF_DIR))
    assert plan.count("Expand") >= 1, plan


def test_range_bucketed_join_is_equi_not_nested_loop(spark):
    """join_range_bucketed must plan a hash/sort-merge EQUI-join on
    (user_id, bucket) — never a nested-loop — that's the whole point of
    the bucket-and-refine rewrite."""
    plan = formatted_plan(QUERIES["join_range_bucketed"].fn(spark, SF_DIR))
    assert "NestedLoop" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan


def test_pii_scrub_is_shuffle_free_jvm_path(spark):
    """PII redaction must run scan-speed: pure codegen'd string exprs, no
    shuffle, no Python."""
    df = QUERIES["llm_pii_scrub"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_frame_sample_single_python_stage_no_shuffle(spark):
    """Frame sampling is one Arrow mapInPandas stage over a round-robin
    repartition — payload bytes must cross into Python exactly once and
    never shuffle by key."""
    df = QUERIES["multimodal_frame_sample"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    # tree node renders as "MapInPandas (N" — the detail section repeats
    # the name without the paren, so count tree occurrences only
    assert plan.count("MapInPandas (") == 1, plan
    assert "hashpartitioning" not in plan, plan


def test_hash_stratified_sample_broadcasts_rates(spark):
    """The rate table is a 5-row broadcast; membership is a scan-side
    filter — no fact shuffle."""
    df = QUERIES["llm_sample_hash_stratified"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "hashpartitioning(doc_id" not in plan, plan


def test_perplexity_shares_term_key_shuffles(spark):
    """Both aggregations key on term/doc hash partitions; the corpus total
    must ride as a broadcast, never a fact-sized exchange."""
    df = QUERIES["llm_perplexity_proxy"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_aqe_replans_at_runtime(spark):
    """The 100-TB posture claims AQE re-plans from runtime statistics —
    prove it: after execution the FINAL adaptive plan must exist and show
    an AQEShuffleRead (runtime partition coalescing of the configured 32
    shuffle partitions down to what the data actually needs)."""
    from pyspark.sql import functions as F

    from classification_problem_with_pyspark_spark.sources.catalog import load

    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders").where(F.col("o_totalprice") > 280000)
    j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    j.collect()  # adaptive plans finalize only on execution
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "AQEShuffleRead" in plan, plan


def test_line_dedup_prunes_scan_and_partial_aggregates(spark):
    # The 5-column documents scan must read only doc_id+text, and the
    # global chunk-frequency groupBy must partial-aggregate map-side
    # before its exchange (the chunk fan-out never shuffles raw).
    df = QUERIES["llm_line_dedup"].fn(spark, SF_DIR)
    rs = read_schemas(df)
    assert "lang" not in rs and "source" not in rs and "n_chars" not in rs, rs
    plan = formatted_plan(df)
    assert "partial_count" in plan, plan


def test_decontaminate_semantic_broadcasts_train_side(spark):
    # The bounded train slice is the broadcast side; the test slice scans
    # partition-parallel. No CartesianProduct anywhere (global audit also
    # enforces this; asserted here for the key's own contract).
    plan = formatted_plan(QUERIES["llm_decontaminate_semantic"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bpe_pair_stats_two_level_aggregation(spark):
    # Vocabulary collapse THEN pair explosion: both groupBys must show
    # map-side partials, and the fact-sized text column feeds only the
    # first (vocab) aggregation.
    plan = formatted_plan(QUERIES["llm_bpe_pair_stats"].fn(spark, SF_DIR))
    assert "partial_count" in plan and "partial_sum" in plan, plan


def test_interpolate_windows_run_on_bounded_aggregate(spark):
    # The window functions must consume the (type, hour) AGGREGATE -- the
    # plan shows the partial-agg exchange BEFORE any Window node, and the
    # window partitions by event_type (no global single-partition sort).
    plan = formatted_plan(QUERIES["window_linear_interpolate"].fn(spark, SF_DIR))
    assert "partial_sum" in plan, plan
    assert "Window" in plan, plan
    first_window = plan.find("Window")
    first_partial = plan.find("partial_sum")
    assert first_partial != -1 and first_window != -1


def test_freshness_sla_broadcasts_watermark_single_agg_pass(spark):
    # The 1-row corpus-max joins by broadcast (never a shuffled cross),
    # and the per-type aggregate partial-aggregates map-side so only
    # (type, max, counts) reach the exchange.
    plan = formatted_plan(QUERIES["audit_freshness_sla"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "partial_count" in plan or "partial_max" in plan, plan


def test_theil_sen_pairs_join_is_equi_keyed(spark):
    # The quadratic pair stage must be an equi-join on event_type with
    # the day inequality as residual — never a nested-loop over events.
    plan = formatted_plan(QUERIES["agg_theil_sen"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan
    # pairs are built from the DAILY aggregate: partial agg precedes the join
    assert "partial_count" in plan, plan


def test_weighted_priority_sample_prunes_text(spark):
    # Priority sampling needs doc_id/lang/n_chars only — the text column
    # (the fat one) must not be read.
    rs = read_schemas(QUERIES["llm_sample_weighted_priority"].fn(spark, SF_DIR))
    assert "text" not in rs, rs


def test_attribution_join_is_user_keyed(spark):
    # purchases x touches must equi-join on user (7-day lookback as
    # residual), with purchase-keyed windows after — no global sort of
    # the fact and no cartesian.
    plan = formatted_plan(QUERIES["events_attribution_multitouch"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    # equi-join on user_id with the 7-day lookback as residual; the
    # purchase side is small enough that AQE may broadcast it
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan
    assert "Window" in plan, plan


def test_preference_pairs_windows_share_one_shuffle(spark):
    # Both rank windows partition by (lang, source): the plan must show
    # a single hashpartitioning exchange for them (Spark collapses
    # same-key windows), then the winners join.
    plan = formatted_plan(QUERIES["llm_preference_pairs"].fn(spark, SF_DIR))
    # Spark pushes the rn==1 filters into WindowGroupLimit (top-1 rows
    # drop BEFORE the exchange) and broadcasts the winners join —
    # pin both optimizations so a refactor can't silently lose them.
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_mor_reconstruction_single_window_over_key(spark):
    # Base+log reconstruction = one row_number window keyed on the
    # primary key; both sources union below it (no join, no repeated
    # passes over the base).
    plan = formatted_plan(QUERIES["sink_merge_on_read_roundtrip"].fn(spark, SF_DIR))
    assert plan.count("+- Window (") == 1, plan
    # rank<=1 pushes into WindowGroupLimit: losers drop before the window
    assert "WindowGroupLimit" in plan, plan
    assert "Union" in plan, plan


def test_dow_seasonality_expected_side_broadcasts(spark):
    # The (type, dow) baseline is 35 rows — it must broadcast back onto
    # the daily aggregate, and both aggregates partial-aggregate.
    plan = formatted_plan(
        QUERIES["events_dow_seasonality_residual"].fn(spark, SF_DIR)
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_count" in plan, plan


def test_skyline_uses_only_growing_window_frames(spark):
    # the r3 perf fix: the O(n^2) rangeBetween(1, unboundedFollowing)
    # frame (380 s at sf0.1) must never come back - only incremental
    # growing frames (unboundedPreceding..current) and lag remain
    plan = QUERIES["join_skyline_pareto"].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "unboundedfollowing" not in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan


def test_fifo_allocation_is_an_equi_join_on_part(spark):
    # the range residual must ride the part equi-key (hash/sort-merge/
    # broadcast-hash), never a nested-loop over the inequality
    plan = QUERIES["join_fifo_allocation"].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan


def test_geo_knn_stays_cell_bounded(spark):
    # adaptive grid kNN: candidates come from the (cx, cy) equi-join;
    # no cartesian, no nested loop over raw points
    plan = QUERIES["join_geo_grid_knn"].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan


def test_bootstrap_fanout_combines_map_side(spark):
    # the B-way replicate fan-out must collapse with partial aggregation
    # before the shuffle (the Poisson-bootstrap plan shape)
    plan = formatted_plan(QUERIES["agg_bootstrap_ci_revenue"].fn(spark, SF_DIR))
    assert "partial" in plan.lower(), plan
    assert "Exchange" in plan, plan


def test_sql_join_hints_are_honored(spark):
    # the /*+ hint */ surface: BROADCAST forces a broadcast join and
    # MERGE forces sort-merge on the same query text
    from classification_problem_with_pyspark_spark.sources.catalog import register_views

    register_views(spark, SF_DIR, ("customer", "nation"))
    bc = spark.sql(
        "SELECT /*+ BROADCAST(nation) */ c_mktsegment, n_name, count(*) AS n"
        " FROM customer JOIN nation ON c_nationkey = n_nationkey"
        " GROUP BY c_mktsegment, n_name"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bc, bc
    smj = spark.sql(
        "SELECT /*+ MERGE(nation) */ c_mktsegment, n_name, count(*) AS n"
        " FROM customer JOIN nation ON c_nationkey = n_nationkey"
        " GROUP BY c_mktsegment, n_name"
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in smj, smj
