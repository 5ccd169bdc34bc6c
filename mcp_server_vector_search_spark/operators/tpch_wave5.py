"""Fifth wave of TPC-H-shaped analytics: the correlated / nested
subquery shapes — min-per-group decorrelation, HAVING against a global
fraction, NOT-IN exclusion under a distinct count, nested-IN semi
joins, and the double EXISTS / NOT-EXISTS self-join.

None of these exist in the reference (SURVEY.md §2.3).  The fixture
has no ``partsupp`` table, so supply-side quantities are derived from
``lineitem`` aggregates; every adaptation preserves the classic plan
shape (what shuffles, what broadcasts, where the decorrelation
happens), which is the part that matters at 100 TB.

Scale notes:
- `q2_min_cost_supplier` — the correlated "= (SELECT MIN ...)" is
  decorrelated into aggregate-then-join: per-part minimum is computed
  once (|parts|-sized) and broadcast back, never a per-row re-scan.
- `q11_important_parts` — the global scalar denominator is ONE extra
  reduction of the already-aggregated per-part table, attached via a
  1-row cross join (broadcast by construction); lineitem is scanned
  once.
- `q16_supplier_count` — NOT IN becomes a LEFT ANTI join against the
  (tiny, broadcast) excluded-supplier set BEFORE the distinct count,
  so the expensive distinct aggregation sees pre-filtered rows.
- `q20_excess_suppliers` — the nested IN chain is two stacked LEFT
  SEMI joins; the inner HAVING aggregate shuffles lineitem on
  (suppkey, partkey) once and its survivor set (small) broadcasts.
- `q21_waiting_suppliers` — both the EXISTS and the NOT EXISTS are
  self-joins of the same order-enriched lineitem; Spark plans them as
  one shuffle on orderkey reused by both (co-partitioned), which is
  exactly the classic plan: all per-order reasoning happens inside a
  single orderkey partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table
from .relational import _dec, _dsum

_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


def _rev() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))


# ---------------------------------------------------------------------------
# Decorrelated min-per-group (TPC-H Q2 shape)
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH offers AS (
    SELECT l_partkey, l_suppkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / COUNT(*) AS avg_price
    FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p_partkey, s_name, n_name, avg_price AS best_price
FROM offers
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_type = 'LARGE' AND p_size >= 40
  AND avg_price = (SELECT MIN(o2.avg_price) FROM offers o2
                   WHERE o2.l_partkey = offers.l_partkey)
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) with
    the minimum offer price.

    The fixture lacks partsupp, so an "offer" is a supplier's average
    sold price for the part (from lineitem).  The correlated MIN is
    decorrelated into a per-part MIN window over the SAME aggregated
    offers frame — lineitem is scanned ONCE (a join against a separately
    aggregated min table would recompute the offers subtree, i.e. scan
    the fact table twice); ties all survive, matching the SQL's `=`
    semantics.  The window's exchange moves only |offers| rows.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "LARGE") & (F.col("p_size") >= 40)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        (_dsum(_dec("l_extendedprice")) / F.count("*")).alias("avg_price")
    )
    best = F.min("avg_price").over(W.partitionBy("l_partkey"))
    return (
        offers.withColumn("best_price", best)
        .where(F.col("avg_price") == F.col("best_price"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("p_partkey", "s_name", "n_name", "best_price")
    )


# ---------------------------------------------------------------------------
# HAVING against a global fraction (TPC-H Q11 shape)
# ---------------------------------------------------------------------------

Q11_NATION = "NATION_3"
Q11_FRACTION = "0.001"


@register(
    "q11_important_parts",
    oracle=f"""
WITH natl AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))) AS part_value
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE n_name = '{Q11_NATION}'
    GROUP BY l_partkey
)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM natl
WHERE part_value > (SELECT SUM(part_value) * {Q11_FRACTION} FROM natl)
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose national inventory value exceeds a
    fraction of the nation's total.

    One shuffle builds the per-part value table; the global total is a
    second reduction of THAT table (never a lineitem re-scan), attached
    as a broadcast 1-row cross join.  The fraction comparison runs in
    exact decimals on both engines; only the surfaced column is cast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == Q11_NATION)
    value = _dec("l_extendedprice") * _dec("l_quantity")
    natl = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("part_value_dec"))
    )
    total = natl.agg(
        (F.sum("part_value_dec") * F.lit(Q11_FRACTION).cast("decimal(6,3)")).alias(
            "threshold"
        )
    )
    return (
        natl.crossJoin(F.broadcast(total))
        .where(F.col("part_value_dec") > F.col("threshold"))
        .select(
            "l_partkey", F.col("part_value_dec").cast("double").alias("part_value")
        )
    )


# ---------------------------------------------------------------------------
# NOT-IN exclusion + distinct count (TPC-H Q16 shape)
# ---------------------------------------------------------------------------


@register(
    "q16_supplier_count",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 24, 28, 33)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size),
    excluding a blacklisted supplier set.

    The classic excludes complaint suppliers; the fixture has no
    comments, so the blacklist is negative-balance suppliers.  The NOT
    IN runs as a LEFT ANTI broadcast join BEFORE the distinct
    aggregation (none of the blacklist keys are NULL, so anti-join and
    NOT IN agree).  The distinct count is the one real shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 33))
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            bad, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Nested-IN semi joins (TPC-H Q20 shape)
# ---------------------------------------------------------------------------

Q20_QTY = 90


@register(
    "q20_excess_suppliers",
    oracle=f"""
SELECT s_name, n_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > {Q20_QTY})
""",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved heavy volume of red parts.

    The classic compares ps_availqty to half the shipped quantity; the
    fixture has no partsupp, so the inner predicate is "total shipped
    quantity of that red part above a threshold".  The plan shape is
    intact: inner semi join (red parts, broadcast) → aggregate with
    HAVING on (suppkey, partkey) → outer semi join onto supplier.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    red = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    heavy = (
        li.join(red, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .where(F.col("qty") > F.lit(Q20_QTY))
        .select("l_suppkey")
    )
    return (
        s.join(heavy, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# EXISTS + NOT EXISTS self-join (TPC-H Q21 shape)
# ---------------------------------------------------------------------------

Q21_NATION = "NATION_2"
Q21_LATE_DAYS = 60
Q21_TOPN = 15


@register(
    "q21_waiting_suppliers",
    oracle=f"""
WITH lo AS (
    SELECT l_orderkey, l_suppkey,
           l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS late
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM lo l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE n_name = '{Q21_NATION}' AND l1.late
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {Q21_TOPN}
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier finished orders.

    "Late" is shipped more than {Q21_LATE_DAYS} days after the order
    date (the fixture lacks commit/receipt dates).  The EXISTS becomes
    a LEFT SEMI and the NOT EXISTS a LEFT ANTI self-join of the same
    order-enriched lineitem frame — all three legs shuffle on
    l_orderkey once and are co-partitioned; per-order reasoning never
    leaves the partition.  Top-N under a total order (numwait DESC,
    s_name) keeps the hash stable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == Q21_NATION)
    lo = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
            ).alias("late"),
        )
    )
    l1 = lo.where(F.col("late"))
    l2 = lo.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
            "left_anti",
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOPN)
    )
