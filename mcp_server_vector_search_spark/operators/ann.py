"""Approximate nearest-neighbor search — the 100 TB query path.

The reference's D1 operator is a Neo4j HNSW index scan
(reference server.py:87: ``db.index.vector.queryNodes('embeddableIndex',
10, $vec)``).  Spark has no vector index; the Spark-native equivalents
are data-layout tricks that turn ANN into partition pruning:

1. **IVF (inverted file)**: MLlib KMeans as the coarse quantizer;
   every vector is assigned a ``centroid_id``; data is written
   partitioned by it.  At query time the ``nprobe`` nearest centroids
   are computed on the driver (the centroid table is tiny by
   construction) and the scan becomes ``WHERE centroid_id IN (...)`` —
   static partition pruning does the "index scan", reading nprobe/k of
   the data.  Exact scoring then runs only inside the probed cells.

2. **Cosine LSH**: MLlib BucketedRandomProjectionLSH is Euclidean-only;
   on L2-NORMALIZED vectors ``l2² = 2 - 2·cos`` is monotone, so
   Euclidean NN order == cosine NN order (SURVEY.md §4.3.2) and the
   LSH's approxNearestNeighbors answers cosine queries.

Both are approximate (KMeans/LSH seeds fix determinism per Spark
version, but results are not SQL-expressible) → registered WITHOUT
oracles; tests/test_ann.py asserts recall@10 ≥ 0.9 against the exact
operator instead (SURVEY.md §4.3.3).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Sequence

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import l2_normalize, neo4j_score
from ..registry import register
from ..sources.tables import load_table
from .topk import QUERY_VEC_ID, SCORE_DECIMALS, query_vector_df

SEED = 42
# The synthetic testdata embeddings are isotropic Gaussians — there is
# no cluster structure for the quantizer to exploit, so 0.9 recall@10
# requires probing ~half the cells (measured via parameter sweep at
# sf0.01 and sf0.1).  On real text embeddings (the 100 TB case) cells
# are tight and nprobe/n_centroids drops to ~1/10th of the data; the
# recall/nprobe tradeoff is the tunable, not a constant.
N_CENTROIDS = 16
NPROBE = 10
K = 10


def build_ivf_index(
    embeddings: DataFrame, n_centroids: int = N_CENTROIDS, seed: int = SEED
):
    """Train the coarse quantizer and assign every vector to a cell.

    Returns ``(assigned, centroids)`` where ``assigned`` is the input
    plus a ``centroid_id`` column and ``centroids`` is the tiny
    (n_centroids × dim) model table.  Persist ``assigned`` with
    ``write_ivf_index`` to get the partition-pruned layout.
    """
    # Cluster on the UNIT sphere: query-time probing ranks cells by
    # cosine, so the quantizer must partition the same geometry —
    # KMeans on raw vectors would carve cells by magnitude, which the
    # cosine query ignores (observed: recall@10 drops to 0.5).
    # Persist the normalized vectors: KMeans is iterative and would
    # otherwise re-read + re-normalize the parquet once per iteration
    # (at 100 TB the quantizer trains on a persisted SAMPLE, never the
    # full corpus — the assignment pass below is the only full scan).
    with_vec = embeddings.withColumn(
        "__vec", array_to_vector(l2_normalize("embedding"))
    ).persist()
    # random init instead of k-means||: the parallel init runs ~5 extra
    # distributed passes to pick seeds, which costs more than it saves
    # for a coarse quantizer whose cells Lloyd iterations reshape anyway.
    # maxIter 10: a coarse quantizer only needs cells of roughly equal
    # occupancy, not converged centroids — probing covers nprobe/k of
    # the space either way (recall asserted in tests/test_ann.py).
    km = KMeans(
        k=n_centroids,
        seed=seed,
        initMode="random",
        maxIter=10,
        featuresCol="__vec",
        predictionCol="centroid_id",
    )
    model = km.fit(with_vec)
    assigned = model.transform(with_vec).drop("__vec")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def write_ivf_index(assigned: DataFrame, path: str) -> None:
    """Materialize the IVF layout: parquet partitioned by centroid_id.
    At 100 TB this is the index build job; the partitioning is what the
    query-time pruning keys on."""
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


# Built indexes are offline artifacts reused across queries (the
# reference's `embeddableIndex` likewise exists before any query hits
# it — reference README.md:72-79 creates it as DDL, server.py:87 only
# reads it).  Keyed by (dataset, quantizer params); gitignored.
_INDEX_CACHE_ROOT = Path(__file__).resolve().parents[2] / ".cache" / "ivf"


def load_or_build_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = N_CENTROIDS,
    seed: int = SEED,
) -> tuple[DataFrame, list[list[float]]]:
    """Build-once / query-many IVF: return the centroid_id-partitioned
    layout for ``sf_dir``, building and materializing it on first use.

    Query-time cost becomes a partition-pruned read — the KMeans fit
    and assignment pass are paid once per corpus, exactly like the
    reference's index DDL vs its per-query ``queryNodes`` call.  The
    centroids file is written LAST so a half-built cache is never read.
    """
    tag = hashlib.md5(f"{sf_dir}:{n_centroids}:{seed}:v1".encode()).hexdigest()[:12]
    root = _INDEX_CACHE_ROOT / tag
    meta, data = root / "centroids.json", root / "data"
    if meta.exists():
        return spark.read.parquet(str(data)), json.loads(meta.read_text())
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = build_ivf_index(emb, n_centroids, seed)
    write_ivf_index(assigned, str(data))
    meta.write_text(json.dumps(centroids))
    return spark.read.parquet(str(data)), centroids


def nearest_centroids(
    query_vec: Sequence[float], centroids: list[list[float]], nprobe: int = NPROBE
) -> list[int]:
    """Driver-side nprobe selection (the centroid table is tiny —
    this is the one deliberately driver-side step, same as the
    reference binding its query vector client-side)."""
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else -1.0

    scored = sorted(
        ((cos(query_vec, c), i) for i, c in enumerate(centroids)), reverse=True
    )
    return [i for _, i in scored[:nprobe]]


def ivf_topk(
    indexed: DataFrame,
    centroids: list[list[float]],
    query_vec: Sequence[float],
    k: int = K,
    nprobe: int = NPROBE,
) -> DataFrame:
    """ANN top-k over an IVF layout: prune to nprobe cells, exact-score
    only inside them.  When ``indexed`` is read from a
    centroid_id-partitioned path, the IN-filter is partition pruning —
    non-probed cells are never read from storage."""
    probes = nearest_centroids(query_vec, centroids, nprobe)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        indexed.where(F.col("centroid_id").isin(probes))
        .withColumn("score", F.round(neo4j_score("embedding", qcol), SCORE_DECIMALS))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "centroid_id", "score")
    )


@register("ann_ivf_topk")  # approximate → rows-only driver check; recall tested
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    indexed, centroids = load_or_build_ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    ]
    return ivf_topk(indexed, centroids, qvec)


def lsh_topk(
    embeddings: DataFrame,
    query_df: DataFrame,
    k: int = K,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Cosine ANN via Euclidean LSH on unit vectors.

    approxNearestNeighbors prunes by hash-bucket match first and only
    scores the collision set — the LSH analog of the HNSW scan.  The
    returned score is the Neo4j-normalized cosine reconstructed from
    the unit-space distance: cos = 1 - d²/2."""
    unit = embeddings.withColumn(
        "__unit", array_to_vector(l2_normalize("embedding"))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="__unit",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=SEED,
    )
    model = lsh.fit(unit)
    qrow = query_df.select(
        array_to_vector(l2_normalize("__query_vec")).alias("__unit")
    ).first()
    hits = model.approxNearestNeighbors(unit, qrow["__unit"], k, distCol="__l2")
    cos = 1 - (F.col("__l2") * F.col("__l2")) / 2
    return (
        hits.withColumn("score", F.round((1 + cos) / 2, SCORE_DECIMALS))
        .select("vec_id", "score")
        .orderBy(F.desc("score"), F.asc("vec_id"))
    )


@register("ann_lsh_topk")  # approximate → rows-only driver check; recall tested
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, query_vector_df(emb, QUERY_VEC_ID))


@register("semantic_search_hash_embedder")  # embedder output → rows-only check
def q_semantic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference pipeline with OUR embedder in the loop
    (prompt → embed → top-k over embedded corpus), replicating
    server.py:71-102 without a remote embedding RPC: the corpus is
    embedded by the deterministic hash embedder and the 'prompt' is a
    literal text embedded the same way."""
    from ..functions.embedder import hash_embedder

    docs = load_table(spark, sf_dir, "documents")
    embed = hash_embedder()
    # The testdata is a single parquet file → one input split; spread
    # the Arrow-batched embedding UDF across all cores before the scan
    # of the (CPU-bound) embed stage.
    corpus = docs.repartition(
        spark.sparkContext.defaultParallelism
    ).withColumn("embedding", embed(F.col("text")))
    prompt_df = spark.createDataFrame(
        [("spark window query join",)], ["text"]
    ).select(embed(F.col("text")).alias("__query_vec"))
    scored = corpus.crossJoin(F.broadcast(prompt_df)).withColumn(
        "score", F.round(neo4j_score("embedding", "__query_vec"), SCORE_DECIMALS)
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(K)
        .select("doc_id", "text", "score")
    )
