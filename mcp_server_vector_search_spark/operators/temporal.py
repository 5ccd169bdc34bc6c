"""Temporal joins the reference's domain implies but Spark lacks as
built-ins: as-of join and interval/range join (SURVEY.md §2.3 lists
joins as absent from the reference; these are the §2.4 extension
surface for event/order timelines).

Both are expressed as compositions of existing DataFrame ops — no
Python in the loop:

- **As-of join** (each event picks the latest order at-or-before its
  timestamp, per customer): the scalable spelling is NOT a
  per-event subquery but a UNION of both sides tagged by kind,
  one shuffle on the join key, and a carry-forward
  ``last(..., ignorenulls=True)`` window.  Cost: one shuffle + one
  partition-local sort — identical shape to what a dedicated as-of
  operator (e.g. Flink temporal join, QuestDB ASOF) does internally.
- **Range join** (events inside a fixed interval after an order):
  equi-join on the customer key carries the hash/sort-merge strategy;
  the range predicate is evaluated inside the join — never a cross
  join.  At 100 TB you additionally bucket time into coarse chunks and
  add the chunk to the join key to bound the per-key fan-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table

RANGE_DAYS = 3


def asof_join_latest_order(events: DataFrame, orders: DataFrame) -> DataFrame:
    """For every event: the latest order (max o_orderdate, ties broken
    by max o_orderkey) with ``o_orderdate <= ts`` for the same
    customer; null columns when the customer never ordered before."""
    od = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.col("o_orderkey"),
        F.col("o_totalprice"),
    )
    ev = events.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "value",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    # Sort puts order rows before event rows at equal time (<= semantics)
    # and ascending o_orderkey so `last` picks the max-key order among
    # equal dates — mirroring the oracle's ORDER BY ... DESC, rn = 1.
    w = (
        W.partitionBy("key")
        .orderBy("t", "is_event", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = od.unionByName(ev).select(
        "*",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("last_totalprice"),
    )
    return carried.where(F.col("is_event") == 1).select(
        "event_id",
        F.col("t").alias("ts"),
        F.col("key").alias("user_id"),
        "value",
        "last_orderkey",
        "last_totalprice",
    )


@register(
    "join_asof_latest_order",
    oracle="""
WITH ranked AS (
  SELECT e.event_id, e.ts, e.user_id, e.value, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, ts, user_id, value,
       o_orderkey AS last_orderkey, o_totalprice AS last_totalprice
FROM ranked WHERE rn = 1
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_join_latest_order(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "orders")
    )


@register(
    "join_range_funnel",
    oracle="""
SELECT p.event_id AS purchase_id,
       COUNT(*) AS n_lead_events,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS lead_value
FROM events p
JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts - INTERVAL 1 HOUR
 AND e.ts < p.ts
 AND e.event_type IN ('view', 'click')
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join (conversion funnel): for each purchase, the
    same user's view/click events in the preceding hour.

    The equi-key (user_id) carries the shuffle strategy; the time-range
    predicate evaluates inside the join, so the fan-in per user is
    bounded by that user's event rate — never a cross join.  Decimal
    sum keeps the aggregate order-insensitive (fp addition is not
    associative; decimal is)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    lead = ev.where(F.col("event_type").isin("view", "click"))
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("ts") < F.col("p_ts"))
    )
    return (
        p.join(lead, cond)
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_lead_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "lead_value"
            ),
        )
    )


GAPFILL_USERS = 10  # bounded output: spine is ~720 hourly rows/user


@register(
    "timeseries_gap_fill_locf",
    oracle=f"""
WITH bounds AS (
  SELECT user_id,
         date_trunc('hour', MIN(ts)) AS h_min,
         date_trunc('hour', MAX(ts)) AS h_max
  FROM events WHERE user_id < {GAPFILL_USERS} GROUP BY user_id
),
spine AS (
  SELECT user_id, UNNEST(generate_series(h_min, h_max, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds
),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_ts,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
  FROM events WHERE user_id < {GAPFILL_USERS} GROUP BY 1, 2
)
SELECT s.user_id,
       CAST(s.hour_ts AS TIMESTAMP) AS hour_ts,
       CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
       CAST(LAST_VALUE(h.cents IGNORE NULLS) OVER (
            PARTITION BY s.user_id ORDER BY s.hour_ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cents_locf,
       (h.user_id IS NULL) AS is_gap
FROM spine s LEFT JOIN hourly h
  ON s.user_id = h.user_id AND s.hour_ts = h.hour_ts
ORDER BY s.user_id, s.hour_ts
""",
)
def q_timeseries_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series RESAMPLING: an hourly spine per user generated with
    ``F.sequence`` (min→max observed hour), left-joined to the hourly
    aggregate, gaps carried forward with ``last(..., ignorenulls) ROWS
    UNBOUNDED PRECEDING`` — the LOCF gap-fill every monitoring / IoT /
    finance pipeline needs and SQL engines ship as ``GAP_FILL``/
    ``time_bucket``.  Values fold as integer cents so the carried
    value hashes exactly.  Scale shape: the spine explodes from ONE
    row per user (bounds aggregate), the join key is (user, hour) —
    co-partitioned with the aggregate it fills — and the LOCF window
    is a per-user ordered scan, so cost is O(hours x users), never
    O(events x hours).  The ``is_gap`` flag certifies the join found
    exactly the observed hours (a time-zone or truncation bug flips
    flags)."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("user_id") < GAPFILL_USERS
    )
    hourly = (
        e.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    spine = (
        e.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h_min"),
            F.date_trunc("hour", F.max("ts")).alias("h_max"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("h_min", "h_max", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_ts"),
        )
    )
    w = (
        W.partitionBy(spine["user_id"])
        .orderBy("hour_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour_ts"], "left")
        .select(
            "user_id",
            "hour_ts",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.last("cents", ignorenulls=True).over(w).alias("cents_locf"),
            # join-miss test on the count (never NULL for an observed
            # hour), matching the oracle's h.user_id IS NULL — cents
            # would misflag an observed hour whose values are all NULL
            F.col("n_events").isNull().alias("is_gap"),
        )
        .orderBy("user_id", "hour_ts")
    )


# ---------------------------------------------------------------------------
# Interval overlap join WITHOUT an equi-key (bucket decomposition)
# ---------------------------------------------------------------------------

OVERLAP_BUCKET_S = 43_200  # 12 h — windows are intra-day, so <= 3 buckets each
OVERLAP_USER_MOD = 5  # deterministic corpus thinning (user_id % 5 == 0)


def _activity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, calendar day) activity window in exact epoch-second
    longs.  The overlap predicate runs on these truncated longs in BOTH
    engines (Spark ``cast(ts as long)`` and the oracle's
    ``FLOOR(date_part('epoch', ts))`` truncate identically for
    positive epochs), so sub-second precision can never diverge."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id") % OVERLAP_USER_MOD == 0
    )
    return (
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.col("ts").cast("long").alias("t"),
        )
        .groupBy("user_id", "day")
        .agg(F.min("t").alias("s"), F.max("t").alias("e"))
        # scalar window identity: epoch-day stays < 1e5 until year 2243
        .withColumn(
            "win_id",
            F.col("user_id") * 100_000
            + F.datediff("day", F.lit("1970-01-01")),
        )
    )


def count_interval_overlaps(
    w: DataFrame, bucket_s: int = OVERLAP_BUCKET_S
) -> DataFrame:
    """Overlap-pair counts for a (win_id, s, e) window table — the
    bucket-decomposition core (see q_interval_overlap_bucketed for the
    scale rationale; the 100x tier stress-runs this function on 200k
    synthetic windows).  Returns (win_id, n_concurrent) for windows
    with at least one overlap; zero-overlap windows are absent (the
    caller left-joins + coalesces)."""
    b = w.select("win_id", "s", "e").withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"s DIV {bucket_s}"), F.expr(f"e DIV {bucket_s}")
            )
        ),
    )
    a, c = b.alias("a"), b.alias("c")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket"))
        & (F.col("a.s") <= F.col("c.e"))
        & (F.col("c.s") <= F.col("a.e"))
        & (F.col("a.win_id") != F.col("c.win_id"))
        # count the pair once: only in greatest(s_a, s_c)'s bucket
        & (
            F.expr(f"greatest(a.s, c.s) DIV {bucket_s}")
            == F.col("a.bucket")
        ),
    )
    return pairs.groupBy(F.col("a.win_id").alias("win_id")).agg(
        F.count(F.lit(1)).alias("n_concurrent")
    )


@register(
    "join_interval_overlap_bucketed",
    oracle=f"""
WITH w AS (
  SELECT user_id,
         CAST(ts AS DATE) AS day,
         MIN(CAST(FLOOR(date_part('epoch', ts)) AS BIGINT)) AS s,
         MAX(CAST(FLOOR(date_part('epoch', ts)) AS BIGINT)) AS e
  FROM events
  WHERE user_id % {OVERLAP_USER_MOD} = 0
  GROUP BY 1, 2
)
SELECT a.user_id, a.day,
       CAST(COUNT(b.user_id) AS BIGINT) AS n_concurrent
FROM w a
LEFT JOIN w b
  ON a.s <= b.e AND b.s <= a.e
 AND (a.user_id <> b.user_id OR a.day <> b.day)
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_interval_overlap_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap self-join with NO equi-key — the genomic /
    concurrency-analysis join shape Spark has no native operator for
    (join_range_funnel anchors on user_id; here EVERY window may
    overlap every other).

    The naive plan is a cartesian theta-join: O(N²) at any scale.  The
    bucket decomposition restores an equi-key: each window explodes to
    the fixed-width time buckets it touches (``sequence(s DIV W, e DIV
    W)``), candidates pair ONLY inside a bucket (shuffle key =
    bucket), and each overlapping pair is counted exactly once — in
    the bucket containing ``greatest(a.s, b.s)`` (the standard
    dedup-by-canonical-bucket trick, so no distinct pass is needed).
    Work is Σ per-bucket concurrency², never N²; a hot bucket is a
    data-skew fact you salt or narrow W against, and AQE's skew-join
    split handles it without a rewrite.  The oracle runs the naive
    theta-join — same answer, different asymptotics.
    """
    w = _activity_windows(spark, sf_dir)
    return (
        w.join(count_interval_overlaps(w), "win_id", "left")
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("n_concurrent"), F.lit(0))
            .cast("long")
            .alias("n_concurrent"),
        )
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# Nearest as-of join (pandas merge_asof direction='nearest' +
# tolerance): each purchase finds the CLOSEST view/click by the same
# user within 1 hour, in EITHER direction — the attribution-style
# variant of the backward-only asof_join_latest_order above.  Same
# scalable spelling: no per-row subquery — one union, one shuffle on
# the user key, one partition-local sort, and BOTH direction
# candidates come from the same sorted frame (carry-forward last +
# carry-backward first), so adding the second direction costs two
# window columns, not a second shuffle.
# ---------------------------------------------------------------------------

NEAREST_TOL_US = 3_600 * 1_000_000  # 1 hour


@register(
    "join_asof_nearest_interaction",
    oracle=f"""
WITH cand AS (
  SELECT user_id, ts,
         MAX(event_id) AS cand_id
  FROM events WHERE event_type IN ('view', 'click')
  GROUP BY user_id, ts
),
ranked AS (
  SELECT p.event_id AS purchase_id, p.user_id, c.cand_id,
         epoch_us(c.ts) - epoch_us(p.ts) AS delta_us,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
             ORDER BY ABS(epoch_us(c.ts) - epoch_us(p.ts)) ASC,
                      CAST(c.ts > p.ts AS INTEGER) ASC,
                      c.cand_id DESC) AS rn
  FROM events p
  JOIN cand c ON c.user_id = p.user_id
   AND ABS(epoch_us(c.ts) - epoch_us(p.ts)) <= {NEAREST_TOL_US}
  WHERE p.event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id,
       r.cand_id AS nearest_event_id,
       CAST(r.delta_us AS BIGINT) AS delta_us
FROM events p
LEFT JOIN ranked r ON r.purchase_id = p.event_id AND r.rn = 1
WHERE p.event_type = 'purchase'
ORDER BY purchase_id
""",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-interaction attribution: for every purchase, the same
    user's closest view/click within NEAREST_TOL_US of either side
    (|delta| ASC, before-wins-ties, max event_id among equal
    timestamps), NULL when nothing qualifies.

    Plan: candidates collapse to one row per (user, ts) first (the max
    event_id is the only possible winner under the tie rule, so the
    dedup is lossless); the tagged union sorts candidates before
    purchases at equal ts, making the carry-forward ``last`` the
    at-or-before candidate and the carry-backward ``first`` the
    strictly-after candidate; a final CASE picks the closer one inside
    the tolerance.  Exact integer microsecond deltas both engines —
    no float time arithmetic anywhere."""
    ev = load_table(spark, sf_dir, "events")
    cand = (
        # NULL-user candidates can never match: the oracle's equi-join
        # has NULL != NULL semantics, but a window partitionBy would
        # happily group NULL keys together — drop them here so both
        # spellings agree (NULL-user purchases still emit a NULL match)
        ev.where(F.col("event_type").isin("view", "click"))
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("cand_id"))
        .select(
            F.col("user_id").alias("key"),
            F.col("ts").alias("t"),
            F.lit(1).alias("is_cand"),
            "cand_id",
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_cand"),
        F.lit(None).cast("long").alias("cand_id"),
        F.col("event_id").alias("purchase_id"),
    )
    us = F.unix_micros(F.col("t"))
    cand_us = F.when(F.col("is_cand") == 1, us)
    # candidates sort BEFORE purchases at equal t: equal-timestamp
    # interactions are at-or-before (delta 0), the after leg is strict
    order = [F.col("t").asc(), F.col("is_cand").desc(), F.col("cand_id").asc()]
    wb = W.partitionBy("key").orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    wa = W.partitionBy("key").orderBy(*order).rowsBetween(W.currentRow, W.unboundedFollowing)
    framed = cand.unionByName(purch).select(
        "*",
        F.last("cand_id", ignorenulls=True).over(wb).alias("b_id"),
        F.last(cand_us, ignorenulls=True).over(wb).alias("b_us"),
        F.first("cand_id", ignorenulls=True).over(wa).alias("a_id"),
        F.first(cand_us, ignorenulls=True).over(wa).alias("a_us"),
    )
    p = framed.where(F.col("is_cand") == 0)
    db = us - F.col("b_us")  # >= 0
    da = F.col("a_us") - us  # > 0
    b_ok = F.col("b_us").isNotNull() & (db <= NEAREST_TOL_US)
    a_ok = F.col("a_us").isNotNull() & (da <= NEAREST_TOL_US)
    pick_b = b_ok & (~a_ok | (db <= da))  # tie -> before, like the oracle
    return p.select(
        "purchase_id",
        F.col("key").alias("user_id"),
        F.when(pick_b, F.col("b_id"))
        .when(a_ok, F.col("a_id"))
        .alias("nearest_event_id"),
        F.when(pick_b, -db).when(a_ok, da).cast("long").alias("delta_us"),
    ).orderBy("purchase_id")
