"""Similarity joins: all pairs above a cosine threshold (SURVEY.md §2.4).

Exact form = cross join + threshold filter.  At test scale the small
side broadcasts so the join is map-only; at 100 TB the exact form is
O(n²) by definition and the scale path is the LSH-bucketed join in
``ann.py`` / ``dedup.py`` (candidate pairs from bucket equi-joins, exact
re-scoring only on candidates).  Both are exposed; only the exact one is
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import dot, l2_norm
from ..registry import register
from ..sources.tables import load_table

SIM_THRESHOLD = 0.5
SCORE_DECIMALS = 6


def cosine_self_join(
    embeddings: DataFrame, threshold: float, id_col: str = "vec_id"
) -> DataFrame:
    """Distinct pairs (a < b) with cosine similarity above ``threshold``.

    The a<b predicate is applied on the join keys BEFORE scoring so the
    filter participates in the join condition (halves the pair count at
    the source rather than post-hoc).
    """
    # Precompute each row's norm ONCE before the join: the pair-side
    # expression is then a single array traversal (the dot product)
    # instead of three — same arithmetic as dot/( |a|·|b| ), bit-identical
    # to scoring inside the join, at a third of the per-pair cost.
    with_norm = embeddings.select(
        F.col(id_col), F.col("embedding"), l2_norm("embedding").alias("nrm")
    )
    left = with_norm.select(
        F.col(id_col).alias("a_id"),
        F.col("embedding").alias("a_vec"),
        F.col("nrm").alias("a_nrm"),
    )
    right = with_norm.select(
        F.col(id_col).alias("b_id"),
        F.col("embedding").alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
    )
    pairs = left.join(F.broadcast(right), F.col("a_id") < F.col("b_id"))
    cos = dot("a_vec", "b_vec") / F.nullif(
        F.col("a_nrm") * F.col("b_nrm"), F.lit(0.0)
    )
    return (
        pairs.withColumn("cos_sim", F.round(cos, SCORE_DECIMALS))
        .where(F.col("cos_sim") > threshold)
        .select("a_id", "b_id", "cos_sim")
    )


@register(
    "similarity_join_threshold",
    oracle=f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
             {SCORE_DECIMALS}) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
            {SCORE_DECIMALS}) > {SIM_THRESHOLD}
""",
)
def q_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_self_join(load_table(spark, sf_dir, "embeddings"), SIM_THRESHOLD)
