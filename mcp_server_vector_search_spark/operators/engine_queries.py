"""Driver correctness row for the engine facade (O8) — VERDICT r2 #5.

``SparkVectorSearch.search`` (engine.py) is the Spark-native analog of
the reference's single MCP tool ``vector_search_neo4j`` (reference
servers/mcp_neo4j_vector_search/server.py:67-106): prompt → embed →
dim-check → normalized-cosine score → top-k → project.  The engine
tests exercise it, but until round 3 it carried no hard driver row.
This module registers the facade end-to-end as a query with a
trained-constant oracle, exactly like ``semantic_search_hash_embedder``
(operators/ann.py): the prompt's hash embedding is deterministic, so
the oracle generator folds it into SQL literals and the whole facade
path is value-hash-checked.

The corpus is the pre-embedded ``embeddings`` table joined to
``documents`` metadata (the reference's corpus lives pre-embedded in
Neo4j the same way, README.md:124); only the PROMPT is embedded at
query time — through the facade's real path, i.e. the Arrow-batched
embedder UDF in a 1-row Spark job (server.py:78's client-side RPC
analog), not the driver-side shortcut.  The JSON serialization wrapper
(``search`` vs ``search_df``) is the same rows through
``F.to_json(struct)``, which carries its own byte-equal driver row
(``rows_as_json``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import SparkVectorSearch
from ..functions.train import sql_floats
from ..registry import register
from ..sources.tables import load_table
from .ann import PROMPT_TEXT, prompt_embedding
from .topk import SCORE_DECIMALS

ENGINE_K = 10  # reference server.py:87


def _engine_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        F.col("doc_id").cast("string").alias("name"),
        F.col("text").alias("description"),
        "embedding",
    )


def _engine_oracle() -> str:
    qv = sql_floats(prompt_embedding())
    return f"""
WITH corpus AS (
  SELECT CAST(d.doc_id AS VARCHAR) AS name,
         d.text AS description,
         e.embedding
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
)
SELECT name, description,
       ROUND((1.0 + list_cosine_similarity(embedding::DOUBLE[], {qv}::DOUBLE[])) / 2.0,
             {SCORE_DECIMALS}) AS score
FROM corpus
ORDER BY score DESC, name
LIMIT {ENGINE_K}
"""


@register("engine_search_e2e", oracle=_engine_oracle())
def q_engine_search_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's actual end-to-end path (server.py:71-102) through
    the facade: construct the engine over the corpus, search a fixed
    prompt, return the top-k (name, description, score) rows."""
    engine = SparkVectorSearch(_engine_corpus(spark, sf_dir))
    return engine.search_df(PROMPT_TEXT, k=ENGINE_K)


def _engine_ann_oracle() -> str | None:
    """IVF-pruned mirror of the facade search: the same trained
    centroid literals, the same rounded-argmax assignment, the same
    driver-side probe list over the PROMPT's hash embedding — then the
    docs join and (name, description, score) projection."""
    from ..functions.train import ORACLE_SF_DIR, load_sorted_vectors
    from .ann import (
        NPROBE,
        TRAIN_SAMPLE,
        ivf_assign_sql,
        nearest_centroids,
        train_centroids,
    )

    try:
        _, x = load_sorted_vectors(ORACLE_SF_DIR)
    except Exception:  # pragma: no cover - testdata absent
        return None
    # TRAIN_SAMPLE from .ann — it must mirror the sample the SERVED IVF
    # index trains on (ann._sample_vectors' default), not PQ's
    cents = train_centroids([list(v) for v in x[:TRAIN_SAMPLE]])
    qvec = prompt_embedding()
    probes = nearest_centroids(qvec, cents, NPROBE)
    qv = sql_floats(qvec)
    # the top-k POOL is cut by (score DESC, vec_id) — the same numeric
    # tie-break ivf_topk applies — BEFORE the docs join; cutting after
    # the join by name (VARCHAR) would order rounded-score ties
    # lexicographically and pick a different row set
    return f"""
WITH {ivf_assign_sql(cents)},
pool AS (
  SELECT vec_id,
         ROUND((1.0 + list_cosine_similarity(embedding::DOUBLE[], {qv}::DOUBLE[])) / 2.0,
               {SCORE_DECIMALS}) AS score
  FROM assign
  WHERE centroid_id IN ({", ".join(str(p) for p in probes)})
  ORDER BY score DESC, vec_id
  LIMIT {ENGINE_K}
)
SELECT CAST(d.doc_id AS VARCHAR) AS name,
       d.text AS description,
       p.score
FROM pool p JOIN documents d ON d.doc_id = p.vec_id
"""


@register("engine_search_ann", oracle=_engine_ann_oracle())
def q_engine_search_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The facade search over the ANN INDEX — the reference's actual
    architecture (its tool delegates to Neo4j's HNSW index, reference
    server.py:87 `db.index.vector.queryNodes`); here the delegate is
    the IVF partitioned layout: prompt hash-embedding → driver-side
    nprobe cell selection → partition-pruned exact scoring → docs
    metadata join → top-k (name, description, score).

    Compared to `engine_search_e2e` (exact full scan), this is the
    100 TB serving path: the scan touches nprobe/n_centroids of the
    corpus, and the docs join probes only the k result ids
    (broadcast)."""
    from .ann import ivf_topk, load_or_build_ivf_index

    indexed, cents = load_or_build_ivf_index(spark, sf_dir)
    qvec = prompt_embedding()
    hits = ivf_topk(indexed, cents, qvec, k=ENGINE_K).select("vec_id", "score")
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.join(F.broadcast(hits), docs.doc_id == hits.vec_id)
        .select(
            F.col("doc_id").cast("string").alias("name"),
            F.col("text").alias("description"),
            "score",
        )
        .orderBy(F.desc("score"), F.asc("name"))
    )
