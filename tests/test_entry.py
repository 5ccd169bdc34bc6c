"""Self-enforcing driver-sample rotation (VERDICT r8 task 1).

The driver's correctness gate samples the first ~50 entries of the
``queries()`` iteration order.  VERDICT r7 and r8 both caught a stale
hand-rotated prefix, so ``__spark_entry__._prioritized`` now DERIVES
the order from the committed ``CORRECTNESS_r*.json`` records.  These
tests pin the invariant: iteration order ascends by last-checked
round, never-checked queries lead, and the sample prefix is exactly
the stalest cohort.
"""

from __future__ import annotations

import importlib

import pytest

entry_mod = importlib.import_module("__spark_entry__")

SAMPLE_SIZE = 50  # driver samples ~50 queries per round


@pytest.fixture(scope="module")
def ordered_names():
    return list(entry_mod.queries())


def test_order_ascends_by_last_checked_round(ordered_names):
    last = entry_mod.last_checked_rounds()
    rounds = [last.get(n, 0) for n in ordered_names]
    assert rounds == sorted(rounds), (
        "queries() iteration order must ascend by last-checked round; "
        "first violation near "
        + next(
            f"{ordered_names[i]} (r{rounds[i]}) after {ordered_names[i - 1]} (r{rounds[i - 1]})"
            for i in range(1, len(rounds))
            if rounds[i] < rounds[i - 1]
        )
    )


def test_prefix_is_exactly_the_stalest_cohort(ordered_names):
    """No query staler than anything inside the sample is left outside it."""
    last = entry_mod.last_checked_rounds()
    prefix = ordered_names[:SAMPLE_SIZE]
    rest = ordered_names[SAMPLE_SIZE:]
    if not rest:
        return
    max_in_prefix = max(last.get(n, 0) for n in prefix)
    min_in_rest = min(last.get(n, 0) for n in rest)
    assert min_in_rest >= max_in_prefix


def test_never_checked_queries_lead(ordered_names):
    last = entry_mod.last_checked_rounds()
    unseen = [n for n in ordered_names if n not in last]
    assert ordered_names[: len(unseen)] == unseen


def test_queries_and_oracles_share_order():
    q = list(entry_mod.queries())
    o = list(entry_mod.oracle_sql())
    assert o == [n for n in q if n in set(o)]
