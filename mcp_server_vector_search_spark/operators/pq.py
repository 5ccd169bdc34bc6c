"""Product quantization (PQ) ANN — the memory-reduction scale path.

The reference's index is Neo4j HNSW over full float vectors (reference
`servers/mcp_neo4j_vector_search/server.py:87`, dim 1536 floats ≈ 6 KB
per node).  At 100 TB of vectors the working set itself is the problem:
PQ stores each vector as M small codes (here 8 codes ≈ 8 bytes vs
64 floats ≈ 256 bytes, a 32× compression) and answers queries from the
codes alone, re-ranking only a candidate pool exactly.

Spark-first shape:
- **Train** (driver, on a SAMPLE): per-subspace k-means codebooks.
  Sampling is the honest 100 TB design — production quantizers (FAISS
  et al., per the public PQ paper, Jégou/Douze/Schmid 2011) train on
  10⁵-10⁶ sampled vectors regardless of corpus size; the driver-side
  numpy fit here is the same O(sample) work a training job would do.
- **Encode** (distributed, JVM-only): each subvector's nearest codeword
  via higher-order functions over a literal codebook — a pure
  projection, written once to a cached parquet (build-once/query-many,
  same discipline as the IVF cache).
- **Query** (distributed, JVM-only): ADC — the query's per-(subspace,
  codeword) dot products form a tiny M×K lookup table, folded into a
  literal; the approximate score of a row is an ``aggregate`` over its
  M codes indexing that table.  No Python, no shuffle; the scan reads
  ONLY the codes column (byte-scale I/O).
- **Re-rank**: ADC top-``rerank`` candidates join back to the float
  vectors for exact scores → exact top-k of the pool.  Two-stage
  retrieval: cheap approximate scan, exact math on a few rows.

Approximate ⇒ registered without an oracle (rows-only driver check);
tests/test_ann.py asserts recall@10 against the exact operator.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import l2_normalize, neo4j_score
from ..registry import register
from ..sources.tables import load_table
from .topk import QUERY_VEC_ID, SCORE_DECIMALS, query_vector_df

SEED = 42
DIM = 64
M_SUBSPACES = 8
SUB_DIM = DIM // M_SUBSPACES
K_CODEWORDS = 16
TRAIN_SAMPLE = 4096
KMEANS_ITERS = 12
K = 10
RERANK_POOL = 100

_PQ_CACHE_ROOT = Path(__file__).resolve().parents[2] / ".cache" / "pq"


def _train_codebooks(sample_vectors, seed: int = SEED):
    """Per-subspace k-means (numpy, deterministic) on a driver-side
    sample: returns codebooks[m][c] = list of SUB_DIM floats."""
    import numpy as np

    x = np.asarray(sample_vectors, dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    books = []
    for m in range(M_SUBSPACES):
        sub = x[:, m * SUB_DIM : (m + 1) * SUB_DIM]
        centers = sub[rng.choice(len(sub), K_CODEWORDS, replace=False)].copy()
        for _ in range(KMEANS_ITERS):
            d = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(K_CODEWORDS):
                mask = assign == c
                if mask.any():
                    centers[c] = sub[mask].mean(axis=0)
        books.append([[float(v) for v in c] for c in centers])
    return books


def _codebook_lit(books) -> F.Column:
    """codebooks as a literal nested array column: CB[m][c][d]."""
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(v) for v in cw]) for cw in book])
            for book in books
        ]
    )


def _encode(unit_df: DataFrame, books) -> DataFrame:
    """Nearest codeword per subspace, all JVM expressions: for each m,
    distances to the K codewords of subspace m, argmin via
    array_position(array_min).  Runs once at index build."""
    cb = _codebook_lit(books)

    def code_for(m: int) -> F.Column:
        sub = F.slice(F.col("__unit"), m * SUB_DIM + 1, SUB_DIM)
        dists = F.transform(
            cb[m],
            lambda cw: F.aggregate(
                F.zip_with(sub, cw, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    codes = F.array(*[code_for(m) for m in range(M_SUBSPACES)])
    return unit_df.select("vec_id", codes.alias("codes"))


def load_or_build_pq_index(
    spark: SparkSession, sf_dir: str, seed: int = SEED
) -> tuple[DataFrame, list]:
    """Build-once/query-many PQ codes for ``sf_dir``'s embeddings."""
    tag = hashlib.md5(
        f"{sf_dir}:{M_SUBSPACES}:{K_CODEWORDS}:{seed}:v1".encode()
    ).hexdigest()[:12]
    root = _PQ_CACHE_ROOT / tag
    meta, data = root / "codebooks.json", root / "data"
    if meta.exists():
        return spark.read.parquet(str(data)), json.loads(meta.read_text())
    emb = load_table(spark, sf_dir, "embeddings")
    sample = [
        r["embedding"]
        for r in emb.select("embedding").limit(TRAIN_SAMPLE).collect()
    ]
    books = _train_codebooks(sample, seed)
    unit = emb.select("vec_id", l2_normalize("embedding").alias("__unit"))
    _encode(unit, books).write.mode("overwrite").parquet(str(data))
    meta.write_text(json.dumps(books))  # written LAST: gates half-built cache
    return spark.read.parquet(str(data)), books


def pq_adc_topk(
    codes: DataFrame,
    embeddings: DataFrame,
    books,
    query_vec: Sequence[float],
    k: int = K,
    rerank: int = RERANK_POOL,
) -> DataFrame:
    """Two-stage PQ query: ADC approximate scan over codes → exact
    re-rank of the top ``rerank`` pool."""
    import math

    n = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    q = [x / n for x in query_vec]
    # ADC lookup table: lut[m][c] = <q_sub_m, codeword_mc> — M×K floats,
    # computed on the driver and folded into the plan as a literal.
    lut = [
        [
            sum(
                q[m * SUB_DIM + d] * books[m][c][d] for d in range(SUB_DIM)
            )
            for c in range(K_CODEWORDS)
        ]
        for m in range(M_SUBSPACES)
    ]
    lut_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in lut]
    )
    # approx cosine = sum over subspaces of lut[m][codes[m]]
    idx = F.sequence(F.lit(0), F.lit(M_SUBSPACES - 1))
    approx = F.aggregate(
        F.zip_with(F.col("codes"), idx, lambda c, m: lut_lit[m][c]),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pool = (
        codes.withColumn("approx_score", approx)
        .orderBy(F.desc("approx_score"), F.asc("vec_id"))
        .limit(rerank)
        .select("vec_id")
    )
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.join(F.broadcast(pool), "vec_id")
        .withColumn("score", F.round(neo4j_score("embedding", qcol), SCORE_DECIMALS))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "score")
    )


@register("ann_pq_topk")  # approximate → rows-only driver check; recall tested
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes, books = load_or_build_pq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    ]
    return pq_adc_topk(codes, emb, books, qvec)
