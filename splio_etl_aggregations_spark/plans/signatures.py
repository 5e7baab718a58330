"""Plan-shape signatures — a ratchet on the PHYSICAL STRUCTURE of every
registered query (SURVEY.md §5.3-5 extension, added r4).

The plan-audit sweep (tests/test_plan_audit.py) bounds the three
scale-killers (SinglePartition / Cartesian / BNLJ). This module guards
everything SUBTLER: a rework that adds a shuffle, swaps a broadcast
join for a sort-merge join, or stacks a second cache layer changes
cost without tripping any audit cap — the round-3 ``dq_ks_drift``
regression was exactly that (a redundant ``.cache()`` over the prefix
-sum helper's internal cache; +30% wall, zero audit smells).

``signature(df)`` reduces a physical plan to the feature counts that
determine distributed cost; ``tools/plan_signatures.py`` snapshots all
registered queries to ``PLAN_SIGNATURES.json``;
``tests/test_plan_signatures.py`` re-derives and diffs. A deliberate
plan change regenerates the snapshot in the same commit — the diff
then SHOWS the plan delta to the reviewer.

Determinism: signatures must be derived in sorted query order on a
fresh session (operators that execute jobs while BUILDING their frame
— the lake/streaming families — materialize shared caches, and a
materialized InMemoryRelation prints differently than a lazy one, so
derivation order is part of the contract).
"""

from __future__ import annotations

from .checks import explain_str

#: feature -> substring counted in the formatted physical plan.
#: Every feature is a distributed-cost driver: exchanges are shuffles,
#: join strategies set memory/network shape, InMemoryRelation is a
#: cache layer (build cost + storage), Window is a per-partition sort.
FEATURES = {
    # formatted mode prints the partitioning on the Exchange node's
    # Arguments line ("Arguments: hashpartitioning(k, 32), ..."), never
    # adjacent to the word Exchange — count the spec, not the node name
    "exchange_hash": "hashpartitioning(",
    "exchange_range": "rangepartitioning(",
    "exchange_single": "SinglePartition",
    "broadcast_exchange": "BroadcastExchange",
    "bhj": "BroadcastHashJoin",
    "smj": "SortMergeJoin",
    "shj": "ShuffledHashJoin",
    "bnlj": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
    "cache": "InMemoryRelation",
    "window": "Window",
    "sort": "Sort ",
    "take_ordered": "TakeOrderedAndProject",
    "scan_parquet": "Scan parquet",
}


def signature(df) -> dict[str, int]:
    """Feature counts of ``df``'s formatted physical plan (zero-count
    features omitted so the snapshot stays readable)."""
    text = explain_str(df)
    sig = {k: text.count(sub) for k, sub in FEATURES.items()}
    return {k: v for k, v in sig.items() if v}


def registry_signatures(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    """Signatures for every registered query, in sorted order (the
    order is load-bearing — see module docstring)."""
    from ..registry import all_queries

    out: dict[str, dict[str, int]] = {}
    for name in sorted(all_queries()):
        q = all_queries()[name]
        out[name] = signature(q.run(spark, sf_dir))
    return out
