"""Composed training-data pipeline: the operators of this engine wired
into the end-to-end corpus-cleaning job a pretraining pipeline runs —
language gate → quality gate → near-dedup → canonical-document keep.

The reference has no pipeline surface at all (its only computation is
one vector search, reference `servers/mcp_neo4j_vector_search/
server.py:85-91`); this is the BASELINE.json north-star composition
showing the pieces (`functions/text.py` scoring, bag-signature dedup
from `operators/dedup.py`'s family) compose into one lazy plan.

Scale shape: the gates are pure map-side expressions evaluated in the
scan stage (no Python, no shuffle — rows die before ever moving); the
only shuffle is the dedup groupBy on the bag fingerprint; the keep
decision is a min-aggregate, not a window, so it is partial-aggregated
map-side.  At 100 TB this plan reads the corpus once and shuffles only
gate-surviving fingerprint groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..registry import register
from ..sources.tables import load_table

QUALITY_CUT = 0.70
KEEP_LANGS = ("en", "es")
R = 6


@register(
    "pipeline_clean_corpus",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang, n_chars, text,
         0.4 * least(1.0, len(string_split(text, ' ')) / 50.0)
         + 0.3 * (1.0 - len(list_filter(string_split(text, ' '),
                     t -> list_contains(['the', 'a'], t)))::DOUBLE
                      / len(string_split(text, ' ')))
         + 0.3 * len(list_distinct(string_split(text, ' ')))::DOUBLE
                      / len(string_split(text, ' ')) AS quality
  FROM documents
  WHERE lang IN ('en', 'es')
), gated AS (
  SELECT *,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS bag_fp
  FROM scored WHERE quality >= {QUALITY_CUT}
)
SELECT bag_fp,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_members,
       CAST(MIN(lang) AS VARCHAR) AS lang,
       ROUND(MAX(quality), {R}) AS best_quality
FROM gated
GROUP BY bag_fp
""",
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus clean: language gate → quality gate →
    bag-of-words near-dedup → one canonical doc per duplicate group.

    One lazy plan: both gates run inside the scan stage (map-side,
    codegen), the bag fingerprint is the single shuffle key, and the
    canonical choice (min doc_id) plus group stats come out of one
    partial+final aggregate.  No windows, no second pass, no Python.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    gated = (
        d.where(F.col("lang").isin(*KEEP_LANGS))
        .withColumn("quality", T.quality_score(t))
        .where(F.col("quality") >= QUALITY_CUT)
        .withColumn("bag_fp", F.md5(T.bag_signature(t)))
    )
    return gated.groupBy("bag_fp").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.min("lang").cast("string").alias("lang"),
        F.round(F.max("quality"), R).alias("best_quality"),
    )
