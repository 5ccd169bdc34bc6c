"""Custom stateful streaming operator: per-user running statistics via
``applyInPandasWithState``.

This is the extension point for stateful logic Spark's built-in
windows can't express (per-key accumulators, custom eviction, model
state).  The reference has no streaming surface at all (SURVEY.md
§2.3); this operator is the engine's answer to "what does per-entity
state look like at 100 TB": state lives in the state store partitioned
by the grouping key, each micro-batch touches only keys present in the
batch, and the Arrow boundary batches rows per key — never row-at-a-
time Python.

Scale notes: state size is O(distinct keys) × state row width (three
numbers here).  A timeout policy (``GroupStateTimeout``) is how
unbounded key spaces stay bounded — evict idle keys; we keep
NoTimeout because the test corpus has a closed key set.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, max_value double"
)
STATE_SCHEMA = "n long, total double, mx double"


def _update_user_stats(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running state and
    emit the updated totals (update output mode: latest row per user
    wins)."""
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, None
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = float(pdf["value"].max())
        mx = batch_max if mx is None else max(mx, batch_max)
    state.update((n, total, mx))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "n_events": n,
                "total_value": total,
                "max_value": mx,
            }
        ]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum, max) over ``value``."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
