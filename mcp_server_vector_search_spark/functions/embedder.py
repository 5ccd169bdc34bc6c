"""Pluggable embedding inference surface.

The reference has two embedders (SURVEY.md §1.4): OpenAI
`text-embedding-3-small` (1536-dim, the live path —
reference server.py:40-58) and a dead SentenceTransformer path
(384-dim, server.py:26-38).  The lesson taken from that dual surface is
that dimension and model are PARAMETERS.  Our engine exposes one
batch-embedding operator shape:

    df.withColumn("embedding", embedder(F.col("text")))

where ``embedder`` is an Arrow-batched pandas UDF.  Real models plug in
by building the UDF with a model loader (executor-local cache, one load
per worker — the standard broadcast-inference pattern); CI uses the
deterministic hash-projection embedder below, which needs no model
artifacts and is stable across runs/machines.
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64


def _token_vector(token: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-random unit-ish vector for one token,
    seeded from md5 — same on every executor, platform, and run."""
    seed = int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim)


def hash_embedder(dim: int = DEFAULT_DIM) -> Callable[[Column], Column]:
    """Deterministic text → array<float> embedder (bag of hashed token
    vectors, L2-normalized).  Arrow-batched; the per-token vectors are
    memoized per executor process, so a 100 TB corpus with a bounded
    vocabulary amortizes to a dict lookup + vector add per token."""
    cache: dict[str, np.ndarray] = {}

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            acc = np.zeros(dim)
            for tok in (text or "").split(" "):
                vec = cache.get(tok)
                if vec is None:
                    vec = cache[tok] = _token_vector(tok, dim)
                acc += vec
            nrm = np.linalg.norm(acc)
            if nrm > 0:
                acc = acc / nrm
            out.append(acc.astype(np.float32))
        return pd.Series(out)

    return embed


def model_embedder(
    model_loader: Callable[[], object], dim: int, batch_encode: str = "encode"
) -> Callable[[Column], Column]:
    """Real-model embedding UDF (the production path; not exercised in
    CI — no model weights in this environment, mirroring how the
    reference's SentenceTransformer path is never exercised either).

    ``model_loader`` runs once per executor process (module-level cache),
    e.g. ``lambda: SentenceTransformer("all-MiniLM-L6-v2")``.
    """
    state: dict[str, object] = {}

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        model = state.get("m")
        if model is None:
            model = state["m"] = model_loader()
        vecs = getattr(model, batch_encode)(texts.tolist())
        arr = np.asarray(vecs, dtype=np.float32)
        if arr.ndim != 2 or arr.shape[1] != dim:
            # the reference validates dimension on every embedding
            # (server.py:55-56, 80-84); we keep the hard-fail semantics
            raise ValueError(f"embedder returned shape {arr.shape}, want (*, {dim})")
        return pd.Series(list(arr))

    return embed
