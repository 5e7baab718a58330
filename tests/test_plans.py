"""Explain-plan assertions (SURVEY.md §5.3-5) — cheap optimizer regression
checks that the physical plans we rely on at scale actually got picked.

These are the '100 TB posture' guarantees: a filter that doesn't reach
the parquet reader or a dim join that doesn't broadcast is a correctness-
preserving but scale-breaking regression; catch it at plan level."""

from __future__ import annotations

from splio_etl_aggregations_spark import register_all
from splio_etl_aggregations_spark.plans.checks import (
    explain_str,
    has_operator,
    pushed_filters,
)
from splio_etl_aggregations_spark.registry import all_queries

from .conftest import SF_SMALL

register_all()
Q = all_queries()


def test_pushdown_reaches_scan(spark):
    df = Q["scan_parquet_pushdown"].run(spark, SF_SMALL)
    filters = pushed_filters(df)
    assert filters, "expected non-empty PushedFilters on the parquet scan"
    assert any("l_quantity" in f for f in filters)


def test_pushdown_prunes_columns(spark):
    df = Q["scan_parquet_pushdown"].run(spark, SF_SMALL)
    text = explain_str(df)
    # ReadSchema must be narrowed to the projected+filtered columns only.
    read_schema = [ln for ln in text.splitlines() if "ReadSchema" in ln]
    assert read_schema and "l_returnflag" not in read_schema[0]


def test_dim_join_broadcasts(spark):
    df = Q["join_broadcast_equi"].run(spark, SF_SMALL)
    assert has_operator(df, "BroadcastHashJoin")


def test_star_join_broadcasts_nation(spark):
    df = Q["join_multi_star"].run(spark, SF_SMALL)
    assert has_operator(df, "BroadcastHashJoin")


def test_topk_uses_take_ordered(spark):
    df = Q["limit_topk_global"].run(spark, SF_SMALL)
    assert has_operator(df, "TakeOrderedAndProject")


def test_agg_is_partial_final_hash(spark):
    df = Q["agg_pricing_summary"].run(spark, SF_SMALL)
    text = explain_str(df)
    assert text.count("HashAggregate") >= 2, "expected partial+final hash agg"


def test_whole_stage_codegen_covers_scan_pipeline(spark):
    # formatted explain of an unexecuted AdaptiveSparkPlan doesn't mark
    # codegen; the codegen explain mode does.
    df = Q["agg_pricing_summary"].run(spark, SF_SMALL)
    assert "WholeStageCodegen subtrees" in explain_str(df, "codegen")


def test_semi_anti_compile_to_joins(spark):
    semi = explain_str(Q["join_left_semi"].run(spark, SF_SMALL))
    anti = explain_str(Q["join_left_anti"].run(spark, SF_SMALL))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_theta_join_broadcasts_small_side(spark):
    df = Q["join_theta_range"].run(spark, SF_SMALL)
    assert has_operator(df, "BroadcastNestedLoopJoin")


def test_partition_pruning_on_partitioned_sink(spark):
    """A filter on the partition column of a partitionBy-written table
    must become a PartitionFilter (pruned directories), not a data
    filter over a full scan."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from splio_etl_aggregations_spark.sources.loader import load

    t = load(spark, SF_SMALL)
    path = os.path.join(tempfile.mkdtemp(prefix="prune_"), "orders_by_year")
    (
        t["orders"]
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .parquet(path)
    )
    df = spark.read.parquet(path).filter(F.col("o_year") == 1997)
    text = explain_str(df)
    part_lines = [ln for ln in text.splitlines() if "PartitionFilters" in ln]
    assert part_lines and "o_year" in part_lines[0], text
    # and the partition predicate must NOT degrade into a post-scan Filter
    assert df.count() == t["orders"].filter(F.year("o_orderdate") == 1997).count()


def test_bucketed_join_has_no_join_side_exchange(spark):
    """Bucketed+sorted writes on the join key must give a SortMergeJoin
    whose inputs read bucket-aligned with NO shuffle — the only Exchange
    allowed in the plan is the final aggregation's."""
    import re

    df = Q["join_bucketed_colocated"].run(spark, SF_SMALL)
    text = explain_str(df)
    assert "SortMergeJoin" in text
    exchanges = {
        m for m in re.findall(r"\(\d+\) (\w*Exchange)", text)
    }
    assert exchanges == {"Exchange"}, exchanges
    assert len(re.findall(r"\(\d+\) Exchange", text)) == 1, text


def test_global_rank_avoids_single_partition_window(spark):
    """The scalable global rank must range-partition (distributed sort)
    and window only within partitions — never the empty-partition-spec
    WindowExec that collapses to one task."""
    df = Q["win_global_rank_scalable"].run(spark, SF_SMALL)
    text = explain_str(df)
    assert "rangepartitioning" in text.lower()
    # the big-side window partitions by the range-partition id
    assert "partitionBy=[pid]" in text.replace(" ", "") or "pid" in text


def test_flagship_preaggregates_before_join(spark):
    """The RFM plan must aggregate orders/events BEFORE the customer join
    (fan-out guard): every join input is an aggregate, so no join output
    feeds an aggregate keyed on the fact tables."""
    import re

    text = explain_str(Q["rfm_customer_360"].run(spark, SF_SMALL))
    # count join operators via their detail headers "(N) <Op>Join…"
    # (the tree section repeats each operator name)
    joins = re.findall(r"\(\d+\) \w*Join", text)
    assert len(joins) == 2, joins
    assert "HashAggregate" in text


def test_salted_join_shuffles_not_broadcasts(spark):
    """join_salted_skew exists to exercise the real shuffle-join path —
    if the planner broadcast the replicated dim the salting would be
    decorative."""
    df = Q["join_salted_skew"].run(spark, SF_SMALL)
    text = explain_str(df)
    assert "ShuffledHashJoin" in text, text
    assert "BroadcastHashJoin" not in text


def test_ntile_percent_cume_avoid_single_partition_window(spark):
    """Round 2 rewrote win_ntile / win_percent_cume onto the two-phase
    global rank — their plans must range-partition and must not contain
    an empty-partition-spec WindowExec over the data table (the
    offsets-side window runs over the 16-row partition-size frame only,
    which is the documented bounded exception)."""
    for name in ("win_ntile", "win_percent_cume"):
        text = explain_str(Q[name].run(spark, SF_SMALL))
        assert "rangepartitioning" in text.lower(), name
        # the data-side row_number windows by the range-partition id
        assert "windowspecdefinition(pid#" in text, name


def test_cosine_ops_have_no_driver_collect(spark):
    """The all-pairs vector ops must be single distributed plans
    (block-pair groupBy + FlatMapGroupsInPandas) — round 1 materialized
    the whole embeddings table on the driver mid-build, which showed up
    as plans whose inputs were LocalTableScan broadcasts. A scan of the
    embeddings parquet must appear INSIDE the plan instead."""
    for name in ("sim_cosine_topk", "dedup_embedding_cosine"):
        text = explain_str(Q[name].run(spark, SF_SMALL))
        assert "FlatMapGroupsInPandas" in text, name
        assert "embeddings" in text, name


def test_shipping_priority_pushdown_and_topk(spark):
    """The SQL-entry TPC-H Q3 shape must push all three scan filters
    (segment + both date cuts) into the parquet readers and compile its
    ORDER BY + LIMIT to TakeOrderedAndProject — the two properties that
    keep the plan viable when the fact tables are 100 TB."""
    df = Q["sql_shipping_priority"].run(spark, SF_SMALL)
    assert has_operator(df, "TakeOrderedAndProject")
    pf = " | ".join(pushed_filters(df))
    for frag in ("c_mktsegment,BUILDING", "o_orderdate", "l_shipdate"):
        assert frag in pf, frag


def test_lm_quality_broadcasts_model(spark):
    """The unigram model join must be a broadcast (vocabulary-bounded
    build side) — a shuffle join here would reshuffle the whole token
    stream by token, the scale-breaking shape."""
    df = Q["corpus_lm_quality"].run(spark, SF_SMALL)
    assert has_operator(df, "BroadcastHashJoin")


def test_vocab_coverage_topk_and_broadcast(spark):
    """Vocab selection must fuse to TakeOrderedAndProject (never a global
    sort) and the coverage join must broadcast the top-K vocab."""
    df = Q["text_vocab_coverage"].run(spark, SF_SMALL)
    assert has_operator(df, "TakeOrderedAndProject")
    assert has_operator(df, "BroadcastHashJoin")


def test_rep_filter_has_no_lambda_hof(spark):
    """The repetition filter (and the shared zip-gram build) must stay
    out of interpreted lambda territory: no LambdaFunction/transform
    nodes in the plan — the 23x regression class caught in round 2."""
    for name in ("text_rep_ngram_filter", "text_ngrams"):
        text = explain_str(Q[name].run(spark, SF_SMALL))
        assert "lambdafunction" not in text.lower(), name


def test_shuffle_shards_windows_by_shard(spark):
    """The training-shuffle position window must partition by shard —
    never an empty partition spec (single-task global sort)."""
    text = explain_str(Q["corpus_shuffle_shards"].run(spark, SF_SMALL))
    assert "windowspecdefinition(shard#" in text


def test_q6_pushes_all_filters_and_prunes(spark):
    """The Q6 SQL shape's three predicates reach the parquet scan and the
    read schema narrows to the 4 referenced columns."""
    df = Q["sql_forecast_revenue"].run(spark, SF_SMALL)
    filters = pushed_filters(df)
    assert any("l_shipdate" in f for f in filters)
    assert any("l_discount" in f for f in filters)
    assert any("l_quantity" in f for f in filters)
    read_schema = [
        ln for ln in explain_str(df).splitlines() if "ReadSchema" in ln
    ]
    assert read_schema and "l_returnflag" not in read_schema[0]


def test_q10_top20_uses_take_ordered(spark):
    df = Q["sql_returned_item_ranking"].run(spark, SF_SMALL)
    assert has_operator(df, "TakeOrderedAndProject")


def test_q4_exists_decorrelates_to_semi_join(spark):
    """Q4's correlated EXISTS must become a left-semi join, not a
    per-row subquery probe."""
    df = Q["sql_order_priority_check"].run(spark, SF_SMALL)
    text = explain_str(df)
    assert "LeftSemi" in text
    assert "date" in " ".join(pushed_filters(df)).lower() or any(
        "o_orderdate" in f for f in pushed_filters(df)
    )


def test_q21_plans_semi_and_anti_pair(spark):
    """Q21's EXISTS + NOT EXISTS pair must plan as one left-semi and one
    left-anti join on the order key — two bounded shuffles, not nested
    per-row probes."""
    text = explain_str(Q["sql_suppliers_kept_waiting"].run(spark, SF_SMALL))
    assert "LeftSemi" in text
    assert "LeftAnti" in text


def test_q22_anti_join_and_scalar_threshold(spark):
    """Q22: the NOT EXISTS anti join and the single uncorrelated AVG
    subquery (no recompute per row)."""
    text = explain_str(Q["sql_sales_opportunity"].run(spark, SF_SMALL))
    assert "LeftAnti" in text
    assert text.count("Subquery") >= 1


def test_q17_correlated_avg_decorrelates(spark):
    """Q17's 0.2*AVG correlated subquery must become an aggregate joined
    on the part key (no re-scan of lineitem per outer row)."""
    text = explain_str(Q["sql_small_quantity_revenue"].run(spark, SF_SMALL))
    assert "partial_avg" in text or "avg(" in text
    # decorrelation yields a plain join of the aggregated side
    assert "SortMergeJoin" in text or "BroadcastHashJoin" in text or "ShuffledHashJoin" in text


def test_q19_pushes_part_disjunction(spark):
    """Q19: the brand-only disjunction is inferred and pushed to the part
    scan (Or(EqualTo(p_brand...))), so the scan does not read every part."""
    df = Q["sql_disjunctive_revenue"].run(spark, SF_SMALL)
    assert any("p_brand" in f for f in pushed_filters(df))


def test_q7_nation_pair_predicate_stays_in_join(spark):
    """Q7 must broadcast both nation dimension copies; the pair predicate
    evaluates during the join, not as a post-join filter of a 25x fan-out."""
    text = explain_str(Q["sql_volume_shipping"].run(spark, SF_SMALL))
    assert text.count("BroadcastHashJoin") >= 3  # n1, n2, supplier at least


def test_degree_distribution_joins_on_order_key(spark):
    """The co-purchase self-join must key on l_orderkey (bounded fan-out),
    never plan a cartesian."""
    text = explain_str(Q["graph_degree_distribution"].run(spark, SF_SMALL))
    assert "CartesianProduct" not in text
    assert "l_orderkey" in text


def test_woe_iv_totals_frame_broadcasts(spark):
    """ml_woe_iv's totals frame is 1 row and must broadcast."""
    text = explain_str(Q["ml_woe_iv"].run(spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in text or "BroadcastExchange" in text


def test_dpp_injects_runtime_partition_filter(spark):
    """The dim-filtered join over the year-partitioned fact must carry a
    dynamicpruning expression in the fact scan's partition filters."""
    df = Q["scan_dynamic_partition_pruning"].run(spark, SF_SMALL)
    text = explain_str(df)
    assert "dynamicpruning" in text.lower(), text


def test_bloom_prune_injects_runtime_filter(spark):
    """join_bloom_prune's memoized plan must carry the injected bloom
    filter (creation-side bloom_filter_agg + application-side
    might_contain pushed toward the fact scan)."""
    from splio_etl_aggregations_spark.plans.checks import explain_str
    from splio_etl_aggregations_spark.registry import get

    df = get("join_bloom_prune").run(spark, SF_SMALL)
    plan = explain_str(df)
    assert "bloom_filter_agg" in plan
    # and the conf shenanigans must not leak into the session
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"
