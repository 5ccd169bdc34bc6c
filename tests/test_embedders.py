"""Named embedder adapters (reference server.py:25-57 parity), driven
with fake clients — no SDK, no network, no model weights."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcp_server_vector_search_spark.functions.embedder import (
    model_embedder,
    openai_embedder,
)

DIM = 8


class _FakeEmbeddingsAPI:
    """Mimics openai.OpenAI().embeddings: create(input=[...], model=...)
    returns .data items carrying .embedding lists."""

    def __init__(self, dim: int):
        self.dim = dim

    def create(self, input, model):  # noqa: A002 - OpenAI's own kwarg name
        class Item:
            def __init__(self, vec):
                self.embedding = vec

        class Response:
            def __init__(self, data):
                self.data = data

        return Response(
            [Item([float(len(t) % 7 + i) for i in range(self.dim)]) for t in input]
        )


class _FakeOpenAIClient:
    def __init__(self, dim: int = DIM):
        self.embeddings = _FakeEmbeddingsAPI(dim)


def test_openai_adapter_embeds_batches(spark):
    df = spark.createDataFrame(
        [("hello world",), ("spark",), ("",)], "text string"
    )
    embed = openai_embedder(client_factory=lambda: _FakeOpenAIClient(), dim=DIM)
    rows = df.select("text", embed(F.col("text")).alias("embedding")).collect()
    assert all(len(r["embedding"]) == DIM for r in rows)
    # deterministic: same text → same vector
    again = df.select(embed(F.col("text")).alias("e")).collect()
    assert [r["e"] for r in again] == [r["embedding"] for r in rows]


def test_openai_adapter_dim_hard_fail(spark):
    """Wrong-dimension responses must hard-fail, mirroring the
    reference's 'must be a list of 1536 numbers' check."""
    df = spark.createDataFrame([("x",)], "text string")
    embed = openai_embedder(
        client_factory=lambda: _FakeOpenAIClient(dim=DIM + 1), dim=DIM
    )
    with pytest.raises(Exception, match=f"list of {DIM} numbers"):
        df.select(embed(F.col("text")).alias("e")).collect()


class _FakeSentenceTransformer:
    def encode(self, texts):
        return np.stack([np.full(DIM, float(len(t)), dtype=np.float32) for t in texts])


def test_model_embedder_with_st_shaped_model(spark):
    """The SentenceTransformer adapter is model_embedder over a loader;
    exercise the same path with an encode()-shaped fake."""
    df = spark.createDataFrame([("ab",), ("abcd",)], "text string")
    embed = model_embedder(lambda: _FakeSentenceTransformer(), DIM)
    rows = df.select("text", embed(F.col("text")).alias("e")).orderBy("text").collect()
    assert rows[0]["e"] == [2.0] * DIM
    assert rows[1]["e"] == [4.0] * DIM
