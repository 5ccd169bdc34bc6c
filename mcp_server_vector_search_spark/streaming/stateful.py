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


# ---------------------------------------------------------------------------
# Driver-gated applyInPandasWithState row (third streaming mechanism
# under the gate, after the stateful built-in agg and foreachBatch).
# Exact-integer state: values fold as CENTS so no float summation
# order can diverge between the stream, the batch plan, and DuckDB.
# ---------------------------------------------------------------------------

CENTS_OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long, max_cents long"
CENTS_STATE_SCHEMA = "n long, total long, mx long"


def _update_user_cents(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0, None
    for pdf in pdfs:
        if pdf.empty:
            continue
        cents = [int(round(float(v) * 100)) for v in pdf["value"]]
        n += len(cents)
        total += sum(cents)
        bmax = max(cents)
        mx = bmax if mx is None else max(mx, bmax)
    state.update((n, total, mx))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "n_events": n,
                "total_cents": total,
                "max_cents": mx,
            }
        ]
    )


def running_user_cents(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, Σ cents, max cents)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_cents,
            CENTS_OUTPUT_SCHEMA,
            CENTS_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ..registry import register  # noqa: E402
from ..sources.tables import load_table  # noqa: E402


@register(
    "streaming_stateful_user_totals",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS total_cents,
       CAST(MAX(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS max_cents
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def q_streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A CUSTOM stateful operator through the gate: the events table is
    deterministically split into 3 files, replayed one file per
    micro-batch, and folded per user by ``applyInPandasWithState`` —
    per-key state genuinely carries across batches (asserted ≥3
    batches).  Update mode emits a row per touched user per batch;
    ``n_events`` strictly increases per user, so max-``n_events``
    selects each user's FINAL state regardless of sink row order.
    Values fold as integer cents, so the value hash against the batch
    SQL oracle is exact — no float summation-order escape hatch."""
    import tempfile
    import uuid

    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="stateful_src_")
    (
        events.withColumn("__b", F.pmod("event_id", F.lit(3)))
        .repartition(3, "__b")
        .drop("__b")
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="stateful_ckpt_")
    q = (
        running_user_cents(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 3, "state must cross micro-batches"
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    out = (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "total_cents", "max_cents")
        .orderBy("user_id")
        .localCheckpoint(eager=True)
    )
    import shutil

    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out
