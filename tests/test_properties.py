"""Property-style invariants (SURVEY.md §5.2.4) — hypothesis-generated
vectors pushed through the JVM expression library in ONE batched job
per property (each example is a row, not a Spark job)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mcp_server_vector_search_spark.functions.vector import (
    cosine_similarity,
    dim_check,
    dot,
    l2_distance,
    l2_norm,
    l2_normalize,
    neo4j_score,
)

DIM = 8
finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False, width=32
)
vec = st.lists(finite, min_size=DIM, max_size=DIM)


@settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(st.lists(st.tuples(vec, vec), min_size=1, max_size=32))
def test_vector_exprs_match_numpy(spark, pairs):
    df = spark.createDataFrame(
        [(list(map(float, a)), list(map(float, b))) for a, b in pairs],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        dot("a", "b").alias("dot"),
        l2_norm("a").alias("na"),
        l2_distance("a", "b").alias("l2"),
        cosine_similarity("a", "b").alias("cos"),
        neo4j_score("a", "b").alias("score"),
    ).collect()
    for (a, b), r in zip(pairs, rows):
        na_, nb_ = np.array(a, dtype=np.float64), np.array(b, dtype=np.float64)
        assert math.isclose(r["dot"], float(na_ @ nb_), rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(
            r["na"], float(np.linalg.norm(na_)), rel_tol=1e-9, abs_tol=1e-9
        )
        assert math.isclose(
            r["l2"], float(np.linalg.norm(na_ - nb_)), rel_tol=1e-9, abs_tol=1e-7
        )
        denom = np.linalg.norm(na_) * np.linalg.norm(nb_)
        if denom == 0:
            assert r["cos"] is None and r["score"] is None  # null-safe zero norm
        else:
            want = float(na_ @ nb_) / float(denom)
            assert math.isclose(r["cos"], want, rel_tol=1e-9, abs_tol=1e-9)
            # the reference's score commitment: (1+cos)/2 in [0, 1]
            assert -1e-9 <= r["score"] <= 1 + 1e-9


@settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(st.lists(vec, min_size=1, max_size=32))
def test_l2_normalize_unit_or_null(spark, vecs):
    df = spark.createDataFrame(
        [(list(map(float, v)),) for v in vecs], "v array<double>"
    )
    rows = df.select(
        l2_normalize("v").alias("u"), l2_norm("v").alias("n")
    ).select(l2_norm("u").alias("un"), "n").collect()
    for r in rows:
        if r["n"] == 0:
            assert r["un"] is None
        else:
            assert math.isclose(r["un"], 1.0, rel_tol=1e-9)


def test_dim_check_predicate(spark):
    df = spark.createDataFrame(
        [([1.0] * DIM,), ([1.0] * (DIM + 1),), ([],)], "v array<double>"
    )
    got = [r[0] for r in df.select(dim_check("v", DIM)).collect()]
    assert got == [True, False, False]


def test_topk_returns_at_most_k(spark):
    """Mirrors queryNodes' may-return-fewer semantics (SURVEY.md §2.2 D1)."""
    from mcp_server_vector_search_spark.operators.topk import topk

    df = spark.range(3).select(F.col("id").cast("double").alias("x"))
    assert topk(df, 10, [F.desc("x")]).count() == 3
    assert topk(df, 2, [F.desc("x")]).count() == 2


def test_hash_embedder_deterministic_and_unit(spark):
    from mcp_server_vector_search_spark.functions.embedder import hash_embedder

    texts = [("spark window join",), ("vector search",), ("",)]
    df = spark.createDataFrame(texts, ["text"])
    e = hash_embedder(16)
    a = [r[0] for r in df.select(e(F.col("text"))).collect()]
    b = [r[0] for r in df.select(e(F.col("text"))).collect()]
    assert [list(x) for x in a] == [list(x) for x in b]  # run-to-run stable
    for v, (t,) in zip(a, texts):
        n = float(np.linalg.norm(np.array(v, dtype=np.float64)))
        if t:
            assert math.isclose(n, 1.0, rel_tol=1e-5)


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(vec, min_size=1, max_size=12))
def test_matrix_lit_bit_exact_roundtrip(spark, rows):
    """matrix_lit's SQL-parsed literals must be bit-identical to the
    per-element F.lit form (shortest-repr + D suffix round trip)."""
    from mcp_server_vector_search_spark.functions.vector import matrix_lit

    got = spark.range(1).select(matrix_lit(rows).alias("m")).first()["m"]
    assert len(got) == len(rows)
    for grow, row in zip(got, rows):
        assert list(grow) == [float(v) for v in row]


def test_kmeans_deterministic_and_partitions_sample():
    """Same (input, seed) → identical centers; different seed → a valid
    codebook of the same shape."""
    from mcp_server_vector_search_spark.functions.train import kmeans

    rng = np.random.default_rng(0)
    x = rng.standard_normal((200, DIM))
    c1 = kmeans(x, 4, 5, seed=13)
    c2 = kmeans(x, 4, 5, seed=13)
    assert np.array_equal(c1, c2)
    c3 = kmeans(x, 4, 5, seed=7)
    assert c3.shape == c1.shape


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(finite, min_size=1, max_size=16))
def test_sql_floats_roundtrip_through_duckdb(values):
    """sql_floats literals parse back to the identical doubles in the
    oracle engine — the property every trained-constant oracle rests on."""
    import duckdb

    from mcp_server_vector_search_spark.functions.train import sql_floats

    got = duckdb.sql(f"SELECT {sql_floats(values)}::DOUBLE[] AS v").fetchone()[0]
    assert list(got) == [float(v) for v in values]
