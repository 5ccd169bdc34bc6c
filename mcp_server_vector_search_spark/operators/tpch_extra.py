"""Third wave of TPC-H-shaped analytics: conditional-aggregate ratios,
scalar-subquery maxima, correlated scalar subqueries, OR-of-ANDs
pushdown, and anti-join + global-aggregate composition.

The reference delegates every relational operator to Neo4j and ships
none of these shapes (SURVEY.md §2.3; the only query in the tree is
`servers/mcp_neo4j_vector_search/server.py:85-91`).  These close out
the classic decision-support shapes a drop-in engine must answer.

Scale notes baked into each operator:
- `q14_promo_revenue` joins the fact table to `part` — a dimension that
  is broadcast-sized even at 100 TB fact scale (parts grow with SF but
  stay ~1e8 rows; with a larger dim this becomes a shuffle join on
  l_partkey only).  The CASE folds into the aggregate, so the answer is
  one partial+final pair over the joined stream — no second pass.
- `q15_top_supplier` computes the per-supplier revenue aggregate ONCE
  and self-joins it against its own max: Catalyst plans the tiny
  aggregated side (|suppliers| rows) as a broadcast, so the "scalar
  subquery" costs one extra reduction over an already-small table,
  never a re-scan of lineitem.
- `q17_small_quantity_avg` is the correlated-scalar-subquery shape
  decorrelated by hand into aggregate-then-join: per-part avg is
  |parts|-sized, broadcast back onto the fact rows.  The naive
  per-row subquery would be O(n) rescans; this is one shuffle.
- `q19_or_predicate_pushdown` proves disjunctive predicates still
  prune: the common bounds (l_quantity range) are pushed to the scan
  while the OR-of-ANDs residual runs in codegen after the broadcast
  join.
- `q22_idle_customers` chains a global scalar aggregate (broadcast as
  a 1-row literal-ish side) with a LEFT ANTI join — both sides of the
  anti join shuffle on the key once; at scale the orders side would be
  pre-bucketed on o_custkey making the anti join shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table
from .relational import _dec, _dsum

# ---------------------------------------------------------------------------
# Conditional-aggregate ratio over a dimension join (TPC-H Q14 shape)
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle="""
SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2))) ELSE 0 END)
            AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: time-sliced fact scan → dim join → CASE-folded
    conditional aggregate (promo share of revenue).

    The shipdate range reaches PushedFilters (row-group pruning); the
    part join is broadcast; both sums come out of ONE aggregate pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (
                F.lit(100.0)
                * _dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            ).alias("promo_revenue"),
            _dsum(rev).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregate + scalar-subquery max (TPC-H Q15 shape)
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: windowed revenue per supplier, keep the max.

    The revenue CTE is computed once (one shuffle on l_suppkey); its
    global max is derived from the SAME aggregated DataFrame — a
    |suppliers|-row reduction, not a lineitem re-scan — and joined back
    as a broadcast equality filter.  Ties (multiple max suppliers) are
    all returned, ordered by key for a stable hash.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _dsum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery, decorrelated (TPC-H Q17 shape)
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity_avg",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
            AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem l
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
      SELECT 0.2 * AVG(l_quantity) FROM lineitem i
      WHERE i.l_partkey = l.l_partkey)
""",
)
def q17_small_quantity_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part average as a correlated scalar
    subquery, decorrelated into aggregate-then-join.

    The per-part avg is computed once (|parts| rows after one shuffle
    on l_partkey) and joined back; the brand filter is applied on the
    broadcast `part` side BEFORE the join so only matching parts' fact
    rows flow.  At 100 TB the avg subtree would reuse the same
    l_partkey shuffle partitioning as the main join (no extra
    exchange under AQE).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    avg_q = (
        li.groupBy(F.col("l_partkey").alias("ap_key"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut"))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_q, F.col("ap_key") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (_dsum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Disjunctive predicate pushdown (TPC-H Q19 shape)
# ---------------------------------------------------------------------------


@register(
    "q19_or_predicate_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1  AND l_quantity <= 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def q19_or_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.

    Catalyst extracts the common implied bounds (l_quantity ∈ [1,30],
    p_size ≥ 1) as pushable conjuncts for the scans, broadcasts the
    part side, and evaluates the residual disjunction in whole-stage
    codegen post-join — the textbook disjunctive-pushdown plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#12") & sz.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#23") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            _dsum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Global scalar aggregate + anti join (TPC-H Q22 shape)
# ---------------------------------------------------------------------------


@register(
    "q22_idle_customers",
    oracle="""
SELECT cntry, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM (
    SELECT c_custkey, CAST(c_custkey % 10 AS INT) AS cntry, c_acctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
) rich_idle
GROUP BY cntry
ORDER BY cntry
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global-average scalar subquery → anti join
    against orders → grouped aggregate.

    The positive-balance average is a 1-row DataFrame cross-broadcast
    onto customers (no collect at plan-build); customers above it are
    LEFT ANTI joined to RECENT orders on o_custkey — the date filter
    is pushed to the orders scan, shrinking the anti-join build side
    (one shuffle each side; bucketed layout would make it zero) — then
    grouped by a derived country code.  Mirrors Q22 with the schema's
    available columns (c_custkey % 10 stands in for the phone-prefix
    country; "idle" = no order since 2000-01-01 so the result is
    non-empty at every test SF).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    rich = (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_acctbal")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy((F.col("c_custkey") % 10).cast("int").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(_dec("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntry")
    )
