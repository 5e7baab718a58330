#!/usr/bin/env python
"""Regenerate PLANS.md — the physical-plan dossier for the headline
query shapes (the evidence behind SCALING.md's claims, in reviewable
form). Run: ``python tools/plandump.py`` (writes PLANS.md at repo root).

Each entry is the formatted explain of the registered query at sf0.001
plus a one-line reading of what the plan must show (the same properties
tests/test_plans.py asserts mechanically).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from splio_etl_aggregations_spark.plans.checks import explain_str  # noqa: E402
from splio_etl_aggregations_spark.registry import get  # noqa: E402
from splio_etl_aggregations_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

#: (query id, what to read in the plan)
SHOWCASE = [
    (
        "sql_forecast_revenue",
        "Q6 pushdown showcase: all three predicates appear in PushedFilters, "
        "ReadSchema carries only the 4 referenced columns, and the single "
        "exchange is the 1-row partial-aggregate merge.",
    ),
    (
        "join_multi_star",
        "Star join (r3 rewrite): the fact pre-aggregates to the order key "
        "with a map-side partial_sum BEFORE the join chain, so the dominant "
        "exchange carries order-level rows; orders/customer join on their "
        "keys, nation broadcasts, and the final 25-group aggregate is "
        "partial+final HashAggregate over order partials.",
    ),
    (
        "sql_returned_item_ranking",
        "Ranked cut: ORDER BY + LIMIT compiles to TakeOrderedAndProject — "
        "no global sort stage anywhere in the plan.",
    ),
    (
        "win_global_rank_scalable",
        "Two-phase global rank: RangePartitioning exchange + per-partition "
        "window; the only partition-less window runs over the ≤16-row "
        "offsets frame (the SinglePartition exchange feeding it).",
    ),
    (
        "agg_salted_skew",
        "Skew-safe aggregation: the first HashAggregate groups on "
        "(key, salt), the second merges the 16 salt partials per key — "
        "the hot key never lands on one task.",
    ),
    (
        "dedup_near_jaccard",
        "Inverted-index set-similarity join: explode → broadcast rank join "
        "→ prefix explode → self-join on the rank key; never a cross join "
        "of documents.",
    ),
    (
        "sim_cosine_topk",
        "Vector kernel: block-pair decomposition via ArrowEvalPython / "
        "mapInPandas stages; the driver never materializes the table and "
        "the final top-k is TakeOrderedAndProject.",
    ),
    (
        "attribution_linear_multi_touch",
        "Two mirrored RANGE windows over ONE per-user sort (single "
        "user_id exchange), replacing a purchase×touch range join.",
    ),
    (
        "stream_tumbling_hourly",
        "Streaming-capable aggregate (batch form): event-time window + "
        "partial/final HashAggregate — the same transform runs under "
        "readStream with watermark state.",
    ),
    (
        "rfm_customer_360",
        "Flagship: each fact pre-aggregates to the customer key BEFORE the "
        "3-way join (no orders×events fan-out); dimension joins broadcast.",
    ),
    (
        "scan_dynamic_partition_pruning",
        "DPP (r2): the broadcast dim filter reaches the partitioned fact "
        "scan as a dynamicpruning#N runtime partition filter — only the "
        "dimension-selected year directories are read.",
    ),
    (
        "sql_suppliers_kept_waiting",
        "Q21 shape (r2): the EXISTS and NOT EXISTS against lineitem plan "
        "as one left-semi and one left-anti join on the order key — two "
        "bounded shuffles, no per-row subquery probes.",
    ),
    (
        "sql_small_quantity_revenue",
        "Q17 shape (r2): the correlated 0.2·AVG subquery decorrelates to "
        "a per-part aggregate joined back on the part key — lineitem is "
        "scanned twice total, never per outer row.",
    ),
    (
        "sort_skyline_pareto",
        "Skyline (r2): the O(n²) NOT-EXISTS spec executes as per-price "
        "maxima + a two-phase EXCLUSIVE running max (range partition, "
        "local window, 16-row offsets frame) + one dominance join — the "
        "only partition-less window runs over the offsets frame.",
    ),
    (
        "agg_hll_partial_merge",
        "HLL rollup (r3): ONE scan→distinct→hash pipeline fans into both "
        "the per-day register tables and their all-days max-merge via an "
        "Expand (GROUPING SETS ((day,j),(j))) — the r2 two-branch union "
        "re-ran the pipeline per branch.",
    ),
    (
        "lake_zone_map_skip_scan",
        "Lake file skipping (r3): the FileSourceScan's file listing holds "
        "only the zone-map-surviving files (the log pruned the rest before "
        "Spark planned), and the key-range predicate still lands in "
        "PushedFilters for row-group skipping inside them.",
    ),
    (
        "lake_incremental_rollup",
        "Incremental rollup maintenance (r3): the delta branch's "
        "InMemoryFileIndex lists ONLY the files commit 1 removed or added "
        "(data/v000000 removes + data/v000001 adds) — the carried-over "
        "majority of the table never appears in any scan of the "
        "maintenance job; the bootstrap branch reads v0 once, and both "
        "fold through ordinary partial hash aggregates.",
    ),
    (
        "lake_deletion_vectors",
        "Position-delete apply (r4): the base scan carries the _metadata "
        "file/position virtual columns straight into a LeftAnti hash join "
        "keyed on (file_path, row_index) — no business column is compared, "
        "and the DV side's scan is the only extra I/O. A real format "
        "inlines this same algebra as a bitmap filter inside the scan; "
        "the join form is what it lowers from.",
    ),
    (
        "dedup_substring_spans",
        "Span-level dedup (r4, reworked r5): the gram-stream pipeline "
        "(scan→zip/slice projection→explode) collapses to (gram, doc, "
        "count) in ONE partial-aggregating HashAggregate — map-side "
        "combine shrinks the occurrence stream before its only shuffle — "
        "then a count() window partitioned by gram supplies each pair's "
        "distinct-doc count in place; no join back to the occurrence "
        "stream exists anymore (the r4 form re-shuffled every occurrence "
        "through a second gram-keyed join; 2.7 s → 0.6 s warm at sf0.1). "
        "Every exchange hashes on the gram or the doc id — no global "
        "sort, no single-partition stage, so the plan shards by "
        "vocabulary at any scale.",
    ),
]


def main() -> None:
    spark = get_spark(app_name="plandump")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan dossier for the headline shapes",
        "",
        "Auto-generated by `python tools/plandump.py` (formatted explain at "
        "sf0.001, the driver's smoke scale). These are the plans the scale "
        "claims in SCALING.md and the assertions in tests/test_plans.py are "
        "about; regenerate after any operator change.",
        "",
    ]
    for name, reading in SHOWCASE:
        df = get(name).run(spark, SF)
        out += [
            f"## {name}",
            "",
            reading,
            "",
            "```",
            explain_str(df).strip(),
            "```",
            "",
        ]
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"),
        "w",
    ) as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md with {len(SHOWCASE)} plans")


if __name__ == "__main__":
    main()
