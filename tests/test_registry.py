"""Registry / driver-contract invariants.

The driver verifies the FIRST 50 queries in ``queries()`` dict order and
scores a missing oracle inside that window as an error (round-1
CORRECTNESS_r01.json) — so ordering and oracle coverage of the leading
slots are contract, not cosmetics.
"""

from __future__ import annotations

from splio_etl_aggregations_spark import register_all
from splio_etl_aggregations_spark.registry import DRIVER_ORDER, REGISTRY, all_queries

register_all()


def test_driver_order_is_complete_and_exact():
    assert sorted(DRIVER_ORDER) == sorted(REGISTRY), (
        "DRIVER_ORDER out of sync with the registry: "
        f"missing={sorted(set(REGISTRY) - set(DRIVER_ORDER))} "
        f"stale={sorted(set(DRIVER_ORDER) - set(REGISTRY))}"
    )
    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)), "duplicate names"
    assert list(all_queries()) == DRIVER_ORDER


def test_verified_window_is_fully_oracle_backed():
    """Every query in the driver's 50-slot verification window must carry
    an oracle — a missing one scores `err: no_oracle`, burning the slot."""
    window = DRIVER_ORDER[:50]
    missing = [n for n in window if REGISTRY[n].oracle is None]
    assert not missing, f"oracle-less queries inside the verified window: {missing}"


def test_rows_only_tail():
    """Operators without oracles must sit at the very end of the order."""
    names = list(all_queries())
    oracle_flags = [REGISTRY[n].oracle is not None for n in names]
    first_rows_only = oracle_flags.index(False)
    assert all(not f for f in oracle_flags[first_rows_only:]), (
        "rows-only operators interleaved before oracle-backed ones: "
        f"{[n for n, f in zip(names[first_rows_only:], oracle_flags[first_rows_only:]) if f]}"
    )
