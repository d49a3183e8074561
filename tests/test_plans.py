"""Physical-plan guardrails: the suite's scale-critical plan properties must
survive refactors — filters reach the parquet scan, dims broadcast, top-n
avoids global sorts, the as-of operator stays a single window shuffle."""

from __future__ import annotations

import pytest

from conftest import SF_SMALL
from datacooker_dist_spark.suite import QUERIES


def executed_plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMALL)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_scan(spark):
    plan = formatted(spark, "filter_predicate")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_quantity,10.0)" in plan
    assert "In(l_returnflag" in plan


def test_projection_prunes_scan(spark):
    plan = formatted(spark, "project_select")
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,"
        "l_quantity:double,l_shipdate:timestamp_ntz>" in plan
    )


@pytest.mark.parametrize("name", ["join_broadcast", "join_star", "multi_join_topn"])
def test_dim_joins_broadcast(spark, name):
    assert "BroadcastHashJoin" in executed_plan(spark, name)


def test_sort_limit_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in executed_plan(spark, "sort_limit")
    assert "TakeOrderedAndProject" in executed_plan(spark, "multi_join_topn")


def test_semi_anti_join_types(spark):
    assert "LeftSemi" in executed_plan(spark, "join_semi")
    assert "LeftAnti" in executed_plan(spark, "join_anti")


def test_agg_has_partial_phase(spark):
    plan = executed_plan(spark, "agg_hash")
    assert "partial_" in plan  # map-side combine before the shuffle


def test_asof_single_window_shuffle(spark):
    """The as-of operator contributes exactly one hash-partition exchange
    feeding the ordered window (right-side pre-dedup agg adds its own)."""
    plan = executed_plan(spark, "join_asof")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Window [last" in plan


def test_lsh_join_is_equi_not_cross(spark):
    plan = executed_plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", ["join_profit_rollup", "join_nation_volume"])
def test_snowflake_dims_broadcast(spark, name):
    """Q9/Q7 shapes: every dimension join (part/supplier/nation/customer at
    test scale) plans as a broadcast; no cartesian fallback from the
    nation-pair inequality predicate."""
    plan = executed_plan(spark, name)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_in_grouped_subquery_is_semi_join(spark):
    """Q18 shape: IN (grouped subquery) must decorrelate to a semi join —
    never a per-row re-execution or nested-loop."""
    plan = executed_plan(spark, "subquery_in_grouped")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_not_exists_is_anti_join(spark):
    plan = executed_plan(spark, "subquery_not_exists")
    assert "LeftAnti" in plan


def test_filter_clause_single_aggregate(spark):
    """FILTER (WHERE ...) variants fuse into ONE HashAggregate pair (partial
    + final) over one scan — the whole point vs N self-joins."""
    plan = executed_plan(spark, "agg_filter_clause")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_" in plan


def test_lateral_explode_no_shuffle(spark):
    """Generator (posexplode) is a narrow transform: zero exchanges."""
    plan = executed_plan(spark, "lateral_explode")
    assert "Exchange" not in plan
    assert "Generate posexplode" in plan


def test_funnel_windows_share_one_partitioning(spark):
    """Three chained conditional-min windows reuse ONE user_id exchange
    (the whole point vs a 3-way self-join); only the final distinct-count
    rollup adds a second."""
    plan = executed_plan(spark, "funnel_steps")
    assert plan.count("Window ") == 3
    assert plan.count("Exchange hashpartitioning") <= 2


def test_scd2_single_shuffle(spark):
    """Change-collapse lag and validity lead windows share one user_id
    partitioning — a single shuffle end-to-end."""
    plan = executed_plan(spark, "scd2_dim_build")
    assert plan.count("Window ") == 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_disjunctive_filter_single_scan(spark):
    """Q19-shape OR-of-ANDs stays ONE scan of lineitem with a broadcast
    part join — never a UNION of per-branch scans."""
    plan = executed_plan(spark, "disjunctive_filter")
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan


def test_custdist_outer_join_preserved(spark):
    """Q13-shape keeps zero-order customers: the non-equi priority
    predicate lives in the outer join condition, not a post-filter that
    would silently turn it inner."""
    plan = executed_plan(spark, "custdist")
    assert "Outer" in plan


def test_returns_topk_no_global_sort(spark):
    """Q10-shape top-20 runs as TakeOrderedAndProject (per-partition
    top-k + merge), not a full Sort + Limit."""
    plan = executed_plan(spark, "returns_revenue_topk")
    assert "TakeOrderedAndProject" in plan


def test_exists_agg_is_semi_join(spark):
    """Q4-shape EXISTS decorrelates to a left semi join feeding the
    priority aggregate — no nested-loop."""
    plan = executed_plan(spark, "order_priority_exists")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_rank_filter_and_broadcast_idf(spark):
    """tf-idf: idf (vocab-sized) broadcasts into the tf rows and the top-3
    cut is a rank-filter window, not a global sort+limit."""
    plan = executed_plan(spark, "text_tfidf")
    assert "BroadcastHashJoin" in plan
    assert "row_number" in plan
    assert "TakeOrderedAndProject" not in plan
    assert "GlobalLimit" not in plan


def test_gapfill_grid_broadcasts(spark):
    """Gap-fill's hour grid (span × types, volume-independent) must stay on
    the broadcast side; only the hourly pre-aggregate and the per-type
    window shuffle."""
    plan = executed_plan(spark, "timeseries_gapfill")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_pack_sequences_single_window_shuffle(spark):
    """Sequence packing: ONE source-partitioned exchange feeds both the
    prefix-sum window and the batch aggregate."""
    plan = executed_plan(spark, "pack_sequences")
    assert plan.count("Window ") == 1


def test_decontaminate_broadcasts_test_vocab(spark):
    """Decontamination joins the (small) distinct test-gram vocabulary as
    the broadcast side against train grams."""
    plan = executed_plan(spark, "decontaminate_ngrams")
    assert "BroadcastHashJoin" in plan


def test_lateral_subquery_decorrelates(spark):
    """LATERAL (... ORDER BY ... LIMIT 3) must decorrelate to a window
    rank-filter over one shuffle — never a per-row nested loop."""
    plan = executed_plan(spark, "subquery_lateral")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_attribution_single_window_no_self_join(spark):
    """Last-touch attribution is ONE running-max window — no events⋈events
    self-join (quadratic per heavy user) and one exchange."""
    plan = executed_plan(spark, "attribution_last_touch")
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Window ") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_transitions_window_feeds_partial_agg(spark):
    """Markov transitions: LEAD window then a map-side-partial aggregate —
    exactly two exchanges (user window + 25-group agg)."""
    plan = executed_plan(spark, "event_transitions")
    assert plan.count("Window ") == 1
    assert "partial_count" in plan or "HashAggregate" in plan


def test_zorder_key_is_narrow(spark):
    """Morton key computation is pure per-row arithmetic: zero exchanges."""
    plan = executed_plan(spark, "layout_zorder_key")
    assert "Exchange" not in plan


def test_multigrain_uses_expand_single_scan(spark):
    """GROUPING SETS over derived grains must be ONE events scan through
    an Expand, not three unioned scans."""
    plan = executed_plan(spark, "time_rollup_multigrain")
    assert "Expand" in plan
    assert plan.count("events.parquet") == 1


def test_range_banded_is_equi_join(spark):
    """The banded range join must plan as a hash equi-join on the band
    key — never the nested loop the plain inequality form produces."""
    plan = executed_plan(spark, "join_range_banded")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dpp_scan_has_dynamic_pruning(spark):
    plan = executed_plan(spark, "scan_partition_dpp")
    assert "dynamicpruning" in plan.lower()


def test_geo_radius_join_is_grid_equi_join(spark):
    plan = executed_plan(spark, "geo_radius_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_merge_upsert_no_cartesian(spark):
    plan = executed_plan(spark, "merge_upsert_scd1")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_pattern_match_single_aggregate_shuffle(spark):
    # One hash-partitioned exchange (the per-user aggregate); string ops
    # after it are narrow.
    plan = executed_plan(spark, "events_pattern_match")
    assert plan.count("Exchange hashpartitioning") == 1


def test_candidate_dedup_no_cartesian(spark):
    """Every shipped dedup path must source pairs from an LSH-bucket
    equi-join — never an all-pairs cross join (VERDICT r01 task 1/3).
    The embedding queries memoize a checkpointed pair list, so assert on
    the underlying operator plan they build from, plus the (un-memoized)
    edit-distance query plan."""
    from pyspark.sql import functions as F

    from datacooker_dist_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").filter(
        F.col("vec_id") < 500
    )
    pairs = S.cosine_candidate_pairs(emb, 0.45, dim=64, planes=2, tables=32)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    plan = executed_plan(spark, "dedup_edit_distance")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_topk_broadcasts_query_side(spark):
    """Exact similarity_topk is a BNLJ by design (non-equi self-exclusion),
    but the BUILD side must be the bounded query set — broadcast right —
    so cost stays linear in the corpus (VERDICT r01 task 6)."""
    plan = executed_plan(spark, "similarity_topk")
    assert "BroadcastNestedLoopJoin BuildRight" in plan
    assert "CartesianProduct" not in plan


def test_quality_audit_single_scan_expand(spark):
    """The multi-distinct column audit must plan as ONE scan feeding an
    Expand — not one scan per audited column."""
    plan = executed_plan(spark, "quality_audit_columns")
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan


def test_fuzzy_join_is_blocked_equi_join(spark):
    plan = executed_plan(spark, "join_fuzzy_blocked")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_twap_single_shuffle(spark):
    """TWAP = per-key ordered window feeding the grouped sum; the window's
    hash partitioning is reused by the aggregate — exactly one exchange."""
    plan = executed_plan(spark, "timeseries_twap")
    assert plan.count("Exchange hashpartitioning") == 1


def test_skew_profile_takeordered_and_broadcast_totals(spark):
    plan = executed_plan(spark, "skew_profile_keys")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_join_bucketed_zero_exchange(spark):
    """The bucketed-join suite query must plan shuffle-free (broadcast off
    would make it SMJ; at test scale the small side may broadcast — either
    way NO Exchange hashpartitioning on the join keys)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = executed_plan(spark, "join_bucketed")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_embedding_prep_no_cartesian_broadcast_centroids(spark):
    """The embedding-prep pipeline must keep the LSH-candidate pair source
    (no cross join) and broadcast the tiny (label × dim) centroid table
    into the per-component join."""
    plan = executed_plan(spark, "pipeline_embedding_prep")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_asof_tolerance_same_plan_as_asof(spark):
    """The tolerance filter must not change the as-of plan shape: still
    one union+window carry (≤2 hash exchanges incl. right-side pre-agg),
    no join blowup."""
    plan = executed_plan(spark, "join_asof_tolerance")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Window [last" in plan
    assert "CartesianProduct" not in plan


def test_bloom_prefilter_probes_broadcast(spark):
    """The Bloom probe side must stay shuffle-free: all k word fetches
    plan as BroadcastHashJoin, and no CartesianProduct sneaks in."""
    plan = executed_plan(spark, "join_bloom_prefilter")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_no_cartesian(spark):
    """The prefix-filtered containment join must stay equi-join-only —
    the all-pairs space belongs to the oracle, never the plan. Inspect
    the operator's LAZY form (the suite query materializes eagerly, so
    its executed plan is just a checkpoint scan)."""
    from datacooker_dist_spark.operators.dedup import containment_pairs

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    df = containment_pairs(docs, eager=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_topk_is_take_ordered(spark):
    """Global top-k must plan as TakeOrderedAndProject (per-partition
    top-k + driver merge), never a full sort of the gram counts."""
    assert "TakeOrderedAndProject" in executed_plan(spark, "text_ngram_topk")


def test_join_strategy_hints_honored(spark):
    """The engine's join-strategy escape hatches (hints) must reach the
    physical plan: merge → SortMergeJoin, shuffle_hash → ShuffledHashJoin,
    broadcast → BroadcastHashJoin — the knobs a 100 TB operator reaches
    for when AQE's default pick is wrong for a known workload."""
    from pyspark.sql import functions as F

    from datacooker_dist_spark.suite import table

    li = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    cases = [
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
        ("broadcast", "BroadcastHashJoin"),
    ]
    for hint, node in cases:
        j = li.join(o.hint(hint), li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert node in plan, f"hint {hint}: expected {node}"


def test_equidepth_no_single_partition_window(spark):
    """Exact NTILE must run on the distributed rank: the plan carries a
    range-partitioned exchange, never the single-partition collapse a
    bare ntile() OVER (ORDER BY ...) window would plan."""
    plan = executed_plan(spark, "agg_equidepth_histogram")
    # no ntile window (the arithmetic bucket replaces it); ranks come off
    # a range-partitioned exchange. (A SinglePartition exchange still
    # appears for the 1-row global COUNT — that's a scalar, not a sort.)
    assert "ntile" not in plan
    assert "rangepartitioning" in plan.lower()


def test_q5_wave_plan_discipline(spark):
    """Fifth TPC-H wave: top-k shapes run as TakeOrderedAndProject, dims
    broadcast, and no shape falls into a cartesian/nested-loop plan."""
    for name in [
        "shipping_priority", "local_supplier_volume", "priority_line_counts",
        "promo_revenue_share", "large_volume_customer",
        "promo_supplier_candidates", "dormant_customer_balance",
    ]:
        plan = executed_plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    for name in ["shipping_priority", "large_volume_customer"]:
        assert "TakeOrderedAndProject" in executed_plan(spark, name), name
    assert "BroadcastHashJoin" in executed_plan(spark, "local_supplier_volume")


def test_q6_shape_is_scan_plus_scalar_agg(spark):
    """revenue_delta_forecast must stay a single scan feeding a two-phase
    scalar aggregate: every predicate pushed to the scan, no join, and the
    only exchange the 1-row final-aggregate gather."""
    plan = formatted(spark, "revenue_delta_forecast")
    assert "Join" not in plan
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    exec_plan = executed_plan(spark, "revenue_delta_forecast")
    assert exec_plan.count("Exchange") == 1


def test_gopher_rules_no_shuffle(spark):
    """The quality gate is per-row array math — the executed plan must
    contain no exchange and no Python evaluation node."""
    plan = executed_plan(spark, "quality_gopher_rules")
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_dedup_segments_equi_join(spark):
    """Segment-level dedup joins back on the segment key — hash equi-join,
    never a cartesian, with partial aggregation on the frequency count."""
    plan = executed_plan(spark, "dedup_segments")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_" in plan


def test_continuation_wave_plan_discipline(spark):
    """Newest wave: no shape falls into a cartesian/nested-loop plan, the
    aggregates keep their map-side partial phase, and the OHLC window
    shares its bucket keying with the final aggregate (≤ 2 hash
    exchanges: the window's plus at most one AQE-uncoalesced agg)."""
    for name in [
        "timeseries_ohlc", "fk_inclusion_profile", "agg_weighted_avg",
        "embedding_covariance_block", "privacy_k_anonymity",
        "window_moving_median", "agg_higher_moments",
        "pipeline_quality_attrition",
    ]:
        plan = executed_plan(spark, name)
        assert "CartesianProduct" not in plan, name
    for name in ["agg_weighted_avg", "privacy_k_anonymity",
                 "agg_higher_moments"]:
        assert "partial_" in executed_plan(spark, name), name
    ohlc = executed_plan(spark, "timeseries_ohlc")
    assert ohlc.count("Exchange hashpartitioning") <= 2


def test_incremental_dedup_is_index_probe_equi_join(spark):
    """dedup_incremental must plan as equi-joins end to end: the probe is
    a hash join of the new batch's band rows against the index, never a
    cartesian, and verification stays candidate-driven."""
    plan = executed_plan(spark, "dedup_incremental")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_paths_no_cartesian_and_broadcast_tables(spark):
    """PQ and IVF-PQ scoring must broadcast the per-query lookup table
    (never shuffle it against the codes) and contain no cartesian."""
    for name in (
        "similarity_topk_pq", "similarity_topk_ivfpq",
        "similarity_topk_ivfpq_rerank",
    ):
        plan = executed_plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_temperature_mix_single_scan_broadcast_thresholds(spark):
    """The mixing thresholds are a tiny per-source table broadcast back
    over the scan — no shuffle of the documents beyond the final small
    aggregate."""
    plan = executed_plan(spark, "dataset_mix_temperature")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# --------------------------------------------------- global-window sweep


def _plan_nodes(p):
    stack = [p]
    while stack:
        n = stack.pop()
        sn = n.getClass().getSimpleName()
        # AQE wrappers hide their subtree from children(): unwrap the
        # adaptive root and materialized query stages explicitly, else the
        # sweep silently traverses nothing.
        if sn == "AdaptiveSparkPlanExec":
            stack.append(n.executedPlan())
            continue
        if sn.endswith("QueryStageExec"):
            stack.append(n.plan())
            continue
        yield n
        ch = n.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))


def _unbounded_global_windows(df) -> list[str]:
    """Physical-plan nodes that move unbounded data through one task: a
    Window with an empty partition spec (Exchange SinglePartition) whose
    input subtree is NOT already bounded by a limit/TakeOrdered or a
    global (grouping-less, hence 1-row) aggregate. This is the r03
    scale-killer class (pq_codebooks funneled the whole corpus through a
    global row_number before its .limit) generalized into a sweep —
    VERDICT r03 task 8."""

    def bounded(win) -> bool:
        ch = win.children()
        for i in range(ch.length()):
            for d in _plan_nodes(ch.apply(i)):
                sn = d.getClass().getSimpleName()
                if "Limit" in sn or "TakeOrdered" in sn:
                    return True
                if sn in (
                    "HashAggregateExec",
                    "ObjectHashAggregateExec",
                    "SortAggregateExec",
                ) and d.groupingExpressions().isEmpty():
                    return True
        return False

    bad = []
    for n in _plan_nodes(df._jdf.queryExecution().executedPlan()):
        sn = n.getClass().getSimpleName()
        if sn in (
            "WindowExec", "WindowInPandasExec", "WindowGroupLimitExec"
        ) and n.partitionSpec().isEmpty() and not bounded(n):
            bad.append(sn)
    return bad


def test_sweep_detects_unbounded_global_window(spark):
    """Negative control: the sweep must flag the exact shape it exists
    for — a global row_number over an unbounded scan (the pre-fix
    pq_codebooks plan) — and must NOT flag the bounded form."""
    from pyspark.sql import Window, functions as F

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    unbounded = li.withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey"))
    ).filter("rn % 100 = 1").limit(16)
    assert _unbounded_global_windows(unbounded)

    capped = (
        li.select("l_orderkey").orderBy("l_orderkey").limit(1000)
        .withColumn("rn", F.row_number().over(Window.orderBy("l_orderkey")))
        .filter("rn % 100 = 1")
    )
    assert not _unbounded_global_windows(capped)


# Audited exceptions: global windows that run AFTER a grouped aggregate
# whose KEY DOMAIN is bounded by construction (one row per calendar week/
# day, one row per fixed sketch bucket), so the single-partition stage
# sees domain-bounded rows regardless of fact volume — the sweep can't
# see key-domain bounds in the physical plan, so these are justified by
# name (docstrings carry the argument). Any new query that trips the
# sweep must either fix its plan or earn an entry here.
_DOMAIN_BOUNDED_GLOBAL_WINDOW = {
    "growth_wow",               # LAG over one-row-per-week revenue
    "interval_sweep_open_orders",  # running sum over one-row-per-day deltas
    "sketch_quantile_grid",     # cumulative over the ≤4096-row grid sketch
}


def test_sweep_no_unbounded_global_window_in_any_query(spark):
    """Suite-wide guard: no shipped (non-streaming) query plan contains a
    single-partition global-window Exchange over unbounded input."""
    flagged = {}
    for name in sorted(QUERIES):
        if name.startswith("stream_") or name in _DOMAIN_BOUNDED_GLOBAL_WINDOW:
            continue
        df = QUERIES[name](spark, SF_SMALL)
        bad = _unbounded_global_windows(df)
        if bad:
            flagged[name] = bad
    assert not flagged, f"unbounded global windows: {flagged}"


def test_insights_wave_plan_discipline(spark):
    """Round-4b wave: every shape stays cartesian-free; the corr matrix
    is ONE scan + a single 1-row gather (never a pass per pair); the
    gaps/islands and interval-coalesce windows reuse their customer
    hash exchange for the follow-on aggregate (subset-key satisfaction
    — no second shuffle); path/PMI top-ks are TakeOrdered, not global
    sorts; the skyline's only non-equi join is the broadcast left-anti
    dominance pass over the pruned survivor set."""
    for name in [
        "text_collocations_pmi", "window_gaps_islands",
        "interval_merge_overlaps", "profile_fd_violations",
        "privacy_l_diversity", "events_path_topk",
        "agg_corr_matrix", "skyline_2d",
        "text_phonetic_keys", "text_readability",
    ]:
        assert "CartesianProduct" not in executed_plan(spark, name), name

    corr = executed_plan(spark, "agg_corr_matrix")
    assert "Join" not in corr
    assert corr.count("Exchange") == 1

    for name in ["window_gaps_islands", "interval_merge_overlaps"]:
        plan = executed_plan(spark, name)
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "Window" in plan

    for name in ["events_path_topk", "text_collocations_pmi"]:
        assert "TakeOrdered" in executed_plan(spark, name), name

    sky = executed_plan(spark, "skyline_2d")
    assert "BroadcastNestedLoopJoin" in sky  # exact pass on survivors
    assert "LeftAnti" in sky
    assert "partial_max" in sky  # bucket maxima keep map-side partials

    fd = executed_plan(spark, "profile_fd_violations")
    assert "Join" not in fd
    assert "partial_" in fd

    # phonetic keying and readability are pure column algebra + one hash
    # aggregate — no Python evaluation node may appear
    for name in ["text_phonetic_keys", "text_readability"]:
        plan = executed_plan(spark, name)
        assert "Python" not in plan, name
        assert "Join" not in plan, name


def _unbounded_single_partition_gathers(df) -> list[str]:
    """ShuffleExchange-to-SinglePartition nodes whose input subtree is
    NOT bounded by a limit/TakeOrdered or a grouping-less partial
    aggregate — i.e. stages that physically gather raw, data-dependent
    row volumes into one task. Strictly more general than the global-
    window sweep: also catches global sorts, coalesce(1)-style funnels
    and accidental orderBy-without-limit shapes."""
    out = []
    for n in _plan_nodes(df._jdf.queryExecution().executedPlan()):
        if n.getClass().getSimpleName() != "ShuffleExchangeExec":
            continue
        if "SinglePartition" not in n.outputPartitioning().toString():
            continue
        ch = n.children().apply(0)
        bounded = False
        for d in _plan_nodes(ch):
            dn = d.getClass().getSimpleName()
            if "Limit" in dn or "TakeOrdered" in dn:
                bounded = True
                break
            if dn in (
                "HashAggregateExec",
                "ObjectHashAggregateExec",
                "SortAggregateExec",
            ) and d.groupingExpressions().isEmpty():
                bounded = True
                break
        if not bounded:
            out.append(ch.getClass().getSimpleName())
    return out


def test_sweep_no_unbounded_single_partition_gather(spark):
    """Suite-wide guard (generalizes the global-window sweep): no shipped
    non-streaming query may gather an unbounded row volume into a single
    task. The only tolerated shapes are the three documented key-domain-
    bounded rollups (one row per calendar week/day/fixed sketch bucket
    BEFORE the gather — the physical plan can't see the domain bound, so
    they are justified by name, same registry as the window sweep)."""
    flagged = {}
    for name in sorted(QUERIES):
        if (
            name.startswith("stream_")
            or name in _DOMAIN_BOUNDED_GLOBAL_WINDOW
        ):
            continue
        bad = _unbounded_single_partition_gathers(QUERIES[name](spark, SF_SMALL))
        if bad:
            flagged[name] = bad
    assert not flagged, f"unbounded single-partition gathers: {flagged}"


def test_round5_wave_plan_discipline(spark):
    """Round-5 wave: co-moment consumers run ONE Arrow pass (a single
    MapInArrow node) and no joins on the fact scan; the PCA iterate
    joins are broadcast; funnel/bootstrap/rebalance/rake stay
    cartesian-free; the RAKE top-k is TakeOrdered; k-fold assignment is
    a pure projection + one hash-exchange window (no join, no Python)."""
    for name in [
        "events_window_funnel", "privacy_t_closeness", "text_keywords_rake",
        "timeseries_holt_trend", "agg_weighted_median",
        "feature_hashing_trick", "quality_expectation_suite",
        "ml_kfold_assign", "ml_class_rebalance", "stat_bootstrap_ci",
        "graph_modularity", "join_asof_nearest",
        "stat_pca_power_iteration", "stat_regression_multivar",
        "embedding_pca_loadings", "agg_corr_matrix",
    ]:
        assert "CartesianProduct" not in executed_plan(spark, name), name

    for name in ["agg_corr_matrix", "stat_regression_multivar",
                 "stat_pca_power_iteration"]:
        plan = executed_plan(spark, name)
        assert plan.count("MapInArrow") == 1, name
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, name

    # embedding PCA checkpoints its covariance (the Arrow moment pass ran
    # at build time), so the returned plan is the iterate: broadcast
    # joins over the ExistingRDD matrix, never a shuffled join.
    pca = executed_plan(spark, "embedding_pca_loadings")
    assert "ExistingRDD" in pca
    assert "SortMergeJoin" not in pca and "ShuffledHashJoin" not in pca

    assert "TakeOrdered" in executed_plan(spark, "text_keywords_rake")

    kf = executed_plan(spark, "ml_kfold_assign")
    assert "Join" not in kf and "Python" not in kf and "Arrow" not in kf

    fh = executed_plan(spark, "feature_hashing_trick")
    assert "Join" not in fh and "Python" not in fh

    # asof nearest: both carries on ONE union-key exchange (two sorts
    # allowed); the other exchange in the plan is the right side's own
    # (custkey, orderdate) dedup aggregate, not the asof mechanism.
    asn = executed_plan(spark, "join_asof_nearest")
    assert asn.count("Exchange hashpartitioning(_k") == 1
    assert asn.count("Window") == 2  # backward + forward carry


def test_round6_wave_plan_discipline(spark):
    """Round-6 wave: the sorted-neighborhood rank exchange range-
    partitions on the DERIVED bounded key (a substring projection),
    never the raw text column; the residual IVF-PQ probe joins codes
    against BROADCAST artifacts only; the retrain control loop's
    decision lands by a 1-row broadcast (no cartesian anywhere); the
    k-gram build is pure JVM expression work — no Python boundary."""
    snm = executed_plan(spark, "dedup_sorted_neighborhood")
    assert "rangepartitioning(_key" in snm
    assert "substring(" in snm  # the 64-char bound feeds the key
    # the range key is the derived _key + id — the raw text column never
    # appears among the range partitioning expressions
    for line in snm.splitlines():
        if "rangepartitioning" in line:
            assert "text#" not in line, line

    resid = executed_plan(spark, "similarity_topk_ivfpq_residual")
    assert "CartesianProduct" not in resid
    assert "BroadcastHashJoin" in resid  # ADC table + centroid probes

    loop = executed_plan(spark, "similarity_append_retrain_loop")
    assert "CartesianProduct" not in loop

    kg = executed_plan(spark, "kgram_rows_build")
    assert "Python" not in kg and "Arrow" not in kg
    assert "CartesianProduct" not in kg


def test_polygon_join_grid_equi_join(spark):
    """geo_polygon_join (r09): the polygon-cell cover and the edge table
    both broadcast as hash equi-joins (cell ids / pid), the crossing
    count keeps a map-side partial, and no shape falls into a
    cartesian/nested-loop plan."""
    plan = executed_plan(spark, "geo_polygon_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2
    assert "partial_sum" in plan


def test_filtered_topk_no_cartesian(spark):
    """similarity_topk_filtered (r09): the label equality in the
    broadcast join condition must keep the plan cartesian-free (hash
    equi-join on the attribute, or a conditioned BNLJ with the query
    set as build side — never CartesianProduct)."""
    plan = executed_plan(spark, "similarity_topk_filtered")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_fan_out_is_scale_conditional(spark):
    """fan_out (optimization r12, VERDICT r11 task 2): a single-split
    scan still gains the round-robin exchange (the bench tables are
    single-row-group parquet — §2.5 "repartition immediately after the
    read"), but an input already at or above cluster parallelism must
    pass through UNTOUCHED — at 100 TB an unconditional repartition(n)
    is a full corpus shuffle plus the sortBeforeRepartition local sort,
    on data that is already parallel."""
    from datacooker_dist_spark.session import default_parallelism, fan_out

    n = default_parallelism(spark)

    # Single-partition input: the exchange is added.
    narrow = spark.range(0, 1000, 1, 1)
    fanned = fan_out(narrow)
    assert fanned.rdd.getNumPartitions() == n
    plan = fanned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange RoundRobinPartitioning" in plan

    # Already-parallel input (>= cluster parallelism): NO added
    # exchange — the frame comes back identical.
    wide = spark.range(0, 1000, 1, n)
    passed = fan_out(wide)
    assert passed is wide
    plan = passed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # Over-parallel input passes through too (never coalesce here —
    # shrinking is the scan's AQE coalescing job, not fan_out's).
    over = spark.range(0, 1000, 1, n + 7)
    assert fan_out(over) is over
