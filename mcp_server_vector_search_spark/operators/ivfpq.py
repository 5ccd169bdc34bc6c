"""IVF-PQ: partition-pruned cells scanned by compressed codes.

The classic composed ANN index (Jégou/Douze/Schmid 2011's IVFADC, the
default FAISS serving shape): the coarse quantizer bounds WHAT is read
(nprobe cells out of n_centroids — here, literal parquet partition
pruning, see operators/ann.py) and product quantization bounds HOW MUCH
is read per row (M byte-codes instead of dim floats, see
operators/pq.py).  At 100 TB the two multiply: a probe touches
``nprobe/n_centroids`` of the corpus at ``M/(8·dim)`` of the bytes,
and the only float-vector reads are the ``rerank``-row exact pool.

This module is pure composition — the quantizer, codebooks, encode
expression, ADC lookup, and probe selection are the SAME functions the
standalone IVF and PQ operators use (same seeds, same rounding, same
tie-breaks), so the oracle is the two proven oracle fragments chained:
assign → encode → probed ADC → exact re-rank.  Codes here encode the
normalized vector itself, not the cell residual; residual encoding is
the upstream refinement (FAISS's default) and would only change the
training/encode fragments, not the layout or query shape.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.train import ORACLE_SF_DIR, load_sorted_vectors, sql_float, sql_floats
from ..functions.vector import l2_normalize, matrix_lit, neo4j_score
from ..registry import register
from ..sources.tables import load_table
from .ann import (
    ASSIGN_DECIMALS,
    IVF_SEED,
    N_CENTROIDS,
    NPROBE,
    assignment_expr,
    nearest_centroids,
    train_centroids,
)
from .pq import (
    DIST_DECIMALS,
    K,
    K_CODEWORDS,
    M_SUBSPACES,
    RERANK_POOL,
    SUB_DIM,
    TRAIN_SAMPLE,
    _adc_lut,
    _codeword_norms2,
    _encode,
    _sorted_sample,
    _train_codebooks,
    cached_query_vector,
)
from .topk import QUERY_VEC_ID, SCORE_DECIMALS

_IVFPQ_CACHE_ROOT = Path(__file__).resolve().parents[2] / ".cache" / "ivfpq"


def load_or_build_ivfpq_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[list[float]], list]:
    """Build-once/query-many IVF-PQ layout: (vec_id, codes) parquet
    partitioned by ``centroid_id``; returns (index, centroids, books).

    Both models train on the same sorted bounded sample as their
    standalone operators (the FAISS sampling discipline); the one full
    corpus pass computes assignment + codes together, map-side only.
    Metadata is written LAST so a half-built cache is never read."""
    tag = hashlib.md5(
        f"{sf_dir}:{N_CENTROIDS}:{IVF_SEED}:{M_SUBSPACES}:{K_CODEWORDS}:v2".encode()
    ).hexdigest()[:12]
    root = _IVFPQ_CACHE_ROOT / tag
    meta, data = root / "meta.json", root / "data"
    if meta.exists():
        m = json.loads(meta.read_text())
        return spark.read.parquet(str(data)), m["cents"], m["books"]
    emb = load_table(spark, sf_dir, "embeddings")
    _, vecs = _sorted_sample(emb, TRAIN_SAMPLE)
    cents = train_centroids(vecs)
    books = _train_codebooks(vecs)
    unit = emb.select(
        "vec_id",
        assignment_expr(cents).alias("centroid_id"),
        l2_normalize("embedding").alias("__unit"),
    )
    coded = _encode(unit, books).join(
        unit.select("vec_id", "centroid_id"), "vec_id"
    )
    # repartition on the partition column: one writer task per cell, so
    # the layout is cells files, not writers×cells (see write_ivf_index)
    coded.repartition("centroid_id").write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(str(data))
    meta.write_text(json.dumps({"cents": cents, "books": books}))
    return spark.read.parquet(str(data)), cents, books


def ivfpq_topk(
    index: DataFrame,
    embeddings: DataFrame,
    cents: list[list[float]],
    books,
    query_vec: Sequence[float],
    k: int = K,
    nprobe: int = NPROBE,
    rerank: int = RERANK_POOL,
) -> DataFrame:
    """Probed-ADC query: partition-prune to nprobe cells, rank the
    pruned CODES by the ADC table, exact-re-rank the pool."""
    probes = nearest_centroids(query_vec, cents, nprobe)
    lut_lit = matrix_lit(_adc_lut(books, query_vec))
    idx = F.sequence(F.lit(0), F.lit(M_SUBSPACES - 1))
    approx = F.round(
        F.aggregate(
            F.zip_with(F.col("codes"), idx, lambda c, m: lut_lit[m][c]),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        DIST_DECIMALS,
    )
    pool = (
        index.where(F.col("centroid_id").isin(probes))
        .withColumn("approx_score", approx)
        .orderBy(F.desc("approx_score"), F.asc("vec_id"))
        .limit(rerank)
        .select("vec_id", "centroid_id")
    )
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.join(F.broadcast(pool), "vec_id")
        .withColumn("score", F.round(neo4j_score("embedding", qcol), SCORE_DECIMALS))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.col("centroid_id").cast("int").alias("centroid_id"), "score")
    )


def _ivfpq_oracle() -> str | None:
    """The IVF assign fragment chained with the PQ encode/ADC fragments
    (each already proven against its standalone operator), restricted to
    the probed cells, then the exact re-rank."""
    try:
        ids, x = load_sorted_vectors(ORACLE_SF_DIR)
    except Exception:  # pragma: no cover - testdata absent
        return None
    vecs = [list(v) for v in x[:TRAIN_SAMPLE]]
    cents = train_centroids(vecs)
    books = _train_codebooks(vecs)
    norms2 = _codeword_norms2(books)
    qvec = [float(v) for v in x[ids.index(QUERY_VEC_ID)]]
    probes = nearest_centroids(qvec, cents, NPROBE)
    lut = _adc_lut(books, qvec)
    cent_rows = ",\n  ".join(
        f"({i}, {sql_floats(c)}::DOUBLE[])" for i, c in enumerate(cents)
    )
    cw_rows = ",\n  ".join(
        f"({m}, {c}, {sql_float(norms2[m][c])}, {sql_floats(books[m][c])}::DOUBLE[])"
        for m in range(M_SUBSPACES)
        for c in range(K_CODEWORDS)
    )
    lut_rows = ",\n  ".join(
        f"({m}, {c}, {sql_float(lut[m][c])})"
        for m in range(M_SUBSPACES)
        for c in range(K_CODEWORDS)
    )
    return f"""
WITH cents(cid, cv) AS (VALUES
  {cent_rows}
),
csims AS (
  SELECT e.vec_id, c.cid,
         ROUND(list_dot_product(e.embedding::DOUBLE[], c.cv)
               / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])),
               {ASSIGN_DECIMALS}) AS sim
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cid AS centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM csims
  ) WHERE rn = 1
),
unit AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        y -> y / sqrt(list_dot_product(embedding::DOUBLE[],
                                                       embedding::DOUBLE[]))) AS u
  FROM embeddings
),
cw(m, c, cn2, cv) AS (VALUES
  {cw_rows}
),
dists AS (
  SELECT unit.vec_id, cw.m, cw.c,
         ROUND(cw.cn2 - 2 * list_dot_product(
             unit.u[cw.m * {SUB_DIM} + 1 : cw.m * {SUB_DIM} + {SUB_DIM}], cw.cv),
             {DIST_DECIMALS}) AS d
  FROM unit CROSS JOIN cw
),
codes AS (
  SELECT vec_id, m, c AS code FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rn
    FROM dists
  ) WHERE rn = 1
),
lut(m, c, v) AS (VALUES
  {lut_rows}
),
approx AS (
  SELECT codes.vec_id,
         ROUND(list_sum(list(lut.v ORDER BY codes.m)), {DIST_DECIMALS}) AS a
  FROM codes JOIN lut ON lut.m = codes.m AND lut.c = codes.code
  GROUP BY codes.vec_id
),
pool AS (
  SELECT x.vec_id, g.centroid_id
  FROM approx x JOIN assign g ON g.vec_id = x.vec_id
  WHERE g.centroid_id IN ({", ".join(str(p) for p in probes)})
  ORDER BY x.a DESC, x.vec_id
  LIMIT {RERANK_POOL}
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT e.vec_id, CAST(p.centroid_id AS INTEGER) AS centroid_id,
       ROUND((1.0 + list_cosine_similarity(e.embedding::DOUBLE[], q.qv)) / 2.0,
             {SCORE_DECIMALS}) AS score
FROM embeddings e JOIN pool p ON p.vec_id = e.vec_id CROSS JOIN q
ORDER BY score DESC, e.vec_id
LIMIT {K}
"""


@register("ann_ivfpq_topk", oracle=_ivfpq_oracle())
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    index, cents, books = load_or_build_ivfpq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = cached_query_vector(spark, sf_dir)
    return ivfpq_topk(index, emb, cents, books, qvec)
