"""Time-series resampling over the events table.

The reference has no temporal operators at all (SURVEY.md §2.3 — its
one query is a vector index scan).  A data-pipeline engine needs the
regularize-and-fill shape: map irregular event times onto a fixed
grid, aggregate per bucket, and carry the last observation forward
across empty buckets (metrics dashboards, feature snapshots, sensor
alignment all reduce to it).

Scale shape: the per-(series, bucket) aggregate is an ordinary
partial+final hash aggregate; the dense grid is generated with
``sequence`` + ``explode`` (JVM-side, no driver loop) and cross-joined
with the tiny series dimension (broadcast); the forward fill is
``last(ignorenulls) OVER (PARTITION BY series ORDER BY bucket)`` — one
shuffle on the series key, each series filled locally, embarrassingly
parallel across the millions of series a 100 TB corpus would hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table

_GRID_START = "2024-01-01 00:00:00"
_GRID_END = "2024-01-30 23:45:00"
_STEP_SEC = 900  # 15-minute buckets


@register(
    "timeseries_resample_ffill",
    oracle=f"""
WITH grid AS (
    SELECT g AS bucket
    FROM generate_series(TIMESTAMP '{_GRID_START}',
                         TIMESTAMP '{_GRID_END}',
                         INTERVAL 15 MINUTE) t(g)
), types AS (
    SELECT DISTINCT event_type FROM events
), b AS (
    SELECT event_type,
           to_timestamp(FLOOR(epoch(ts) / {_STEP_SEC}) * {_STEP_SEC})::TIMESTAMP AS bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events GROUP BY 1, 2
)
SELECT t.event_type, g.bucket,
       COALESCE(b.n_events, 0) AS n_events,
       last_value(b.avg_value IGNORE NULLS) OVER (
           PARTITION BY t.event_type ORDER BY g.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM grid g
CROSS JOIN types t
LEFT JOIN b ON b.event_type = t.event_type AND b.bucket = g.bucket
""",
)
def timeseries_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute resample of each event-type series with forward fill.

    Empty buckets get n_events = 0 and the last seen average carried
    forward (NULL before a series' first observation — both engines
    agree).  Bucketing is epoch-floor arithmetic so the bucket edges
    are engine- and timezone-independent.
    """
    ev = load_table(spark, sf_dir, "events")
    buckets = (
        ev.groupBy(
            "event_type",
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / _STEP_SEC) * _STEP_SEC
            ).alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
        )
    )
    grid = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(_GRID_START).cast("timestamp"),
                F.lit(_GRID_END).cast("timestamp"),
                F.expr("INTERVAL 15 MINUTES"),
            )
        ).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    dense = grid.crossJoin(F.broadcast(types))
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        dense.join(buckets, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@register(
    "timeseries_interpolate_linear",
    oracle=f"""
WITH grid AS (
    SELECT g AS bucket
    FROM generate_series(TIMESTAMP '{_GRID_START}',
                         TIMESTAMP '{_GRID_END}',
                         INTERVAL 15 MINUTE) t(g)
), types AS (
    SELECT DISTINCT event_type FROM events
), b AS (
    SELECT event_type,
           to_timestamp(FLOOR(epoch(ts) / {_STEP_SEC}) * {_STEP_SEC})::TIMESTAMP AS bucket,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events GROUP BY 1, 2
), dense AS (
    SELECT t.event_type, g.bucket, b.avg_value
    FROM grid g CROSS JOIN types t
    LEFT JOIN b ON b.event_type = t.event_type AND b.bucket = g.bucket
), ctx AS (
    SELECT event_type, bucket, avg_value,
           last_value(avg_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           last_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
           first_value(avg_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           first_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
    FROM dense
)
SELECT event_type, bucket,
       ROUND(CASE
         WHEN avg_value IS NOT NULL THEN avg_value
         WHEN pv IS NULL THEN NULL
         WHEN nv IS NULL THEN pv
         ELSE pv + (nv - pv) * ((epoch(bucket) - epoch(pt))
                              / (epoch(nt) - epoch(pt)))
       END, 6) AS interp_value
FROM ctx
""",
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across empty buckets — the gap-fill used
    for sensor alignment and feature snapshots when carrying the last
    value forward biases downstream aggregates.

    Same dense-grid scaffold as the forward fill; each empty bucket
    sees its previous and next observed (value, time) via two
    ignore-nulls windows over the SAME series partition — still one
    shuffle on the series key, each series interpolated locally.
    Leading gaps stay NULL (nothing to anchor), trailing gaps extend
    the last observation — both engines agree on the edges."""
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type",
        F.timestamp_seconds(
            F.floor(F.unix_timestamp("ts") / _STEP_SEC) * _STEP_SEC
        ).alias("bucket"),
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value")
    )
    grid = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(_GRID_START).cast("timestamp"),
                F.lit(_GRID_END).cast("timestamp"),
                F.expr("INTERVAL 15 MINUTES"),
            )
        ).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    dense = grid.crossJoin(F.broadcast(types)).join(
        buckets, ["event_type", "bucket"], "left"
    )
    back = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_t = F.when(F.col("avg_value").isNotNull(), F.col("bucket"))
    ctx = dense.select(
        "event_type",
        "bucket",
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(back).alias("pt"),
        F.first("avg_value", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_t, ignorenulls=True).over(fwd).alias("nt"),
    )
    frac = (F.unix_timestamp("bucket") - F.unix_timestamp("pt")) / (
        F.unix_timestamp("nt") - F.unix_timestamp("pt")
    )
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(F.col("pv").isNull(), F.lit(None))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return ctx.select(
        "event_type", "bucket", F.round(interp, 6).alias("interp_value")
    )


EWMA_ALPHA = 0.2


@register(
    "timeseries_ewma_per_user",
    oracle=f"""
WITH series AS (
  SELECT user_id,
         list(value ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(vals) AS BIGINT) AS n_events,
       ROUND(list_reduce(vals,
             (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc), 6) AS ewma
FROM series
""",
)
def timeseries_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user — the sequential
    per-entity fold (EWMA_t = α·x_t + (1-α)·EWMA_{t-1}) that windowed
    aggregates cannot express, done as an ARRAY FOLD: one shuffle
    builds each user's time-ordered value array, then ``F.aggregate``
    runs the recurrence left-to-right inside codegen.

    The fold is sequential IEEE arithmetic in both engines (Spark
    ``aggregate`` and DuckDB ``list_reduce`` are both left folds
    seeded by the first element), so the smoothed value is
    hash-exact.  Scale: per-entity history is bounded (a user's
    events), so collect-then-fold is safe; for unbounded streams the
    same recurrence runs incrementally in
    ``applyInPandasWithState`` (streaming/stateful.py) — state is one
    number per key."""
    e = load_table(spark, sf_dir, "events")
    series = e.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"],
        ).alias("vals")
    )
    vals = F.col("vals")
    ewma = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(EWMA_ALPHA) * x + F.lit(1 - EWMA_ALPHA) * acc,
    )
    return series.select(
        "user_id",
        F.size(vals).cast("long").alias("n_events"),
        F.round(ewma, 6).alias("ewma"),
    )
