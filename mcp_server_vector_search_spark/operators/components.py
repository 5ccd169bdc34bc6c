"""Duplicate-cluster formation: connected components over near-dup
pairs.

A dedup pipeline's last stage (BASELINE.json north star): pairwise
near-dup evidence (here the exact n-gram Jaccard pairs from
``dedup.py``) is transitive in practice — A~B and B~C should collapse
into ONE cluster with one canonical survivor.  That is connected
components, which Spark has no built-in for; we implement deterministic
min-label propagation as an iterative DataFrame loop:

    labels(node) = node
    repeat: labels(node) = min(labels(node), min over neighbors)
    until the global label sum stops changing

Each iteration is one equi-join + one aggregation; convergence takes
O(component diameter) rounds (near-dup clusters are shallow — dozens of
rounds would imply a pathological chain of pairwise-similar docs).  The
sum-of-labels convergence probe is monotone non-increasing, so one tiny
aggregate per round decides termination — no driver-side diffing of
label tables.  At 100 TB you would swap the propagation rule for the
large-star/small-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond", SOCC'14) which converges in O(log n) rounds with
the same join+agg building blocks; labels are persisted per round and
the previous round unpersisted, exactly as here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import _NGRAM_ORACLE, dedup_ngram_jaccard

MAX_ITER = 50
# Below this edge count the pair table fits trivially on the driver and
# union-find there beats launching O(diameter) distributed rounds.  The
# near-dup pair list is SMALL relative to the corpus (it is the output
# of an LSH/shingle filter, not the corpus itself) — at 100 TB of
# documents the surviving pair table is typically millions of rows, so
# the driver path covers real workloads; the distributed loop is the
# fallback for adversarial pair volumes.
DRIVER_CC_MAX_EDGES = 5_000_000


def connected_components(
    edges: DataFrame,
    max_iter: int = MAX_ITER,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Connected components over undirected ``(a_id, b_id)`` edges.

    Returns ``(node, comp)`` where ``comp`` is the minimum node id
    reachable from ``node``.  Deterministic: pure min-lattice fixpoint,
    no seeds, no ordering sensitivity.

    Hybrid execution: if the edge table is small (``driver_max_edges``)
    it is collected and solved with path-compressed union-find — one
    job, no iteration.  Otherwise the distributed min-label loop runs
    (one join + one agg per round, O(diameter) rounds).
    """
    # Persisted: the count that picks the strategy and the strategy
    # itself both read the (possibly expensive) upstream pair pipeline.
    edges = edges.persist()
    n_edges = edges.count()
    if n_edges <= driver_max_edges:
        try:
            return _driver_union_find(edges)
        finally:
            edges.unpersist()
    return _distributed_min_label(edges, max_iter)


def _driver_union_find(edges: DataFrame) -> DataFrame:
    rows = edges.select("a_id", "b_id").collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            # union by min so the representative IS the min label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = [(node, find(node)) for node in parent]
    return edges.sparkSession.createDataFrame(out, "node long, comp long")


def _distributed_min_label(edges: DataFrame, max_iter: int) -> DataFrame:
    both = edges.select(
        F.col("a_id").alias("u"), F.col("b_id").alias("v")
    ).unionAll(edges.select(F.col("b_id").alias("u"), F.col("a_id").alias("v")))
    both = both.persist()
    labels = (
        both.select(F.col("u").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    prev_sum = labels.agg(F.sum("comp")).first()[0]
    for _ in range(max_iter):
        neigh = (
            both.join(labels, both.v == labels.node)
            .groupBy("u")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neigh, labels.node == neigh.u, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
            )
            .persist()
        )
        new_sum = new_labels.agg(F.sum("comp")).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    both.unpersist()
    return labels


@register(
    "dedup_duplicate_clusters",
    oracle=f"""
WITH RECURSIVE pairs AS ({_NGRAM_ORACLE}),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id AS u, a_id AS v FROM pairs
),
walk(u, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) AS n
  UNION
  SELECT e.v AS u, w.comp FROM walk w JOIN edges e ON e.u = w.u
)
SELECT u AS doc_id,
       MIN(comp) AS component,
       CAST(u = MIN(comp) AS INTEGER) AS is_canonical
FROM walk GROUP BY u
""",
)
def q_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from exact n-gram Jaccard pairs; the canonical
    survivor per cluster is the minimum doc_id (deterministic keep
    rule, mirrors dedup_exact's MIN(doc_id))."""
    pairs = dedup_ngram_jaccard(spark, sf_dir)
    labels = connected_components(pairs)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("component"),
        (F.col("node") == F.col("comp")).cast("int").alias("is_canonical"),
    )
