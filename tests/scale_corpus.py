"""Seeded ~10× synthetic corpus for the scale-stress suite.

The driver fixtures top out at sf0.1 (5k docs / 5k vectors); the code
paths that only matter at 100 TB — the GEMM build-side slicer's
multi-slice outer loop, the distributed large-star/small-star
connected-components rounds, LSH recall at real candidate volumes —
need a corpus an order of magnitude past that to execute at all.  This
module builds one ONCE at a fixed /tmp path (marker-file idempotent,
fully seeded, schema-identical to the driver testdata) with KNOWN
planted structure so the stress tests can assert recall against ground
truth instead of against another implementation:

- 50,000 documents (30-80 tokens from a 2,500-word vocab + stopwords):
  * 1,000 planted near-duplicate pairs (copy + one appended token —
    distinct-token Jaccard n/(n+1) ≈ 0.97..0.99, shingle Jaccard
    (n-2)/(n-1), both far above the operators' thresholds)
  * 100 planted EXACT duplicate docs (verbatim copies)
- 20,000 embeddings (dim 64): 32 seeded Gaussian clusters (σ=0.1 —
  cluster-mate cosine ≈ 0.6, below the similarity thresholds) plus
  200 planted near-identical vector pairs (cosine ≈ 0.999).

The fixed path keeps the build-once index caches (IVF/IVF-PQ tag on
sf_dir) stable across pytest runs.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCALE_DIR = Path("/tmp/spark_graft_scale10x_v1")
SEED = 20260814

N_BASE = 48_900
N_NEAR_PAIRS = 1_000
N_EXACT_DUPS = 100
N_DOCS = N_BASE + N_NEAR_PAIRS + N_EXACT_DUPS  # 50,000

N_VECS_BASE = 19_800
N_VEC_PAIRS = 200
N_VECS = N_VECS_BASE + N_VEC_PAIRS  # 20,000
DIM = 64
N_CLUSTERS = 32
CLUSTER_NOISE = 0.1
PAIR_NOISE = 0.002

STOPWORDS = ["the", "a", "of", "and", "to", "in"]
LANGS = ["en", "de", "fr", "es", "zh"]


def _build_documents(rng: np.random.Generator) -> dict:
    vocab = np.array([f"w{i}" for i in range(2500)] + STOPWORDS * 60)
    texts: list[str] = []
    lengths = rng.integers(30, 81, size=N_BASE)
    for n in lengths:
        texts.append(" ".join(rng.choice(vocab, size=int(n))))
    near_pairs: list[tuple[int, int]] = []
    # near-dup: source doc + ONE appended token (ids N_BASE..)
    for i in range(N_NEAR_PAIRS):
        src = i  # base ids 0..999
        texts.append(texts[src] + " " + str(rng.choice(vocab)))
        near_pairs.append((src, N_BASE + i))
    exact_pairs: list[tuple[int, int]] = []
    for i in range(N_EXACT_DUPS):
        src = 2000 + i
        texts.append(texts[src])
        exact_pairs.append((src, N_BASE + N_NEAR_PAIRS + i))
    doc_ids = np.arange(N_DOCS, dtype=np.int64)
    tbl = pa.table(
        {
            "doc_id": doc_ids,
            "text": texts,
            "lang": [LANGS[i % len(LANGS)] for i in range(N_DOCS)],
            "source": [f"src{i % 20}" for i in range(N_DOCS)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, SCALE_DIR / "documents.parquet")
    return {"near_pairs": near_pairs, "exact_pairs": exact_pairs}


def _build_embeddings(rng: np.random.Generator) -> dict:
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_CLUSTERS, size=N_VECS_BASE)
    vecs = centers[labels] + rng.normal(scale=CLUSTER_NOISE, size=(N_VECS_BASE, DIM))
    vec_pairs: list[tuple[int, int]] = []
    extra = np.empty((N_VEC_PAIRS, DIM))
    extra_labels = np.empty(N_VEC_PAIRS, dtype=np.int64)
    for i in range(N_VEC_PAIRS):
        src = i * 7  # spread sources across clusters
        extra[i] = vecs[src] + rng.normal(scale=PAIR_NOISE, size=DIM)
        extra_labels[i] = labels[src]
        vec_pairs.append((src, N_VECS_BASE + i))
    allv = np.vstack([vecs, extra]).astype(np.float32)
    all_labels = np.concatenate([labels, extra_labels]).astype(np.int32)
    tbl = pa.table(
        {
            "vec_id": np.arange(N_VECS, dtype=np.int64),
            "embedding": pa.array(list(allv), type=pa.list_(pa.float32())),
            "label": all_labels,
        }
    )
    pq.write_table(tbl, SCALE_DIR / "embeddings.parquet")
    return {"vec_pairs": vec_pairs}


def build_scale_corpus() -> dict:
    """Build (idempotent) and return the planted ground truth."""
    meta_path = SCALE_DIR / "planted.json"
    if meta_path.exists():
        return json.loads(meta_path.read_text())
    SCALE_DIR.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    meta = _build_documents(rng)
    meta.update(_build_embeddings(rng))
    meta_path.write_text(json.dumps(meta))
    return json.loads(meta_path.read_text())
