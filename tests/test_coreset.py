"""Greedy k-center coreset (operators/coreset.py).

Oracle parity runs wholesale in test_oracle_parity.py; these pin the
algorithmic properties: the selection matches an independent numpy
replay of Gonzalez's traversal (same micro quantization), the coverage
radius shrinks monotonically in k, and repartitioning cannot move a
bit (argmax payload rides an order-free struct max over exact longs).
"""

from __future__ import annotations

import math

import numpy as np

from mcp_server_vector_search_spark.operators.coreset import (
    KCENTER_K,
    kcenter_select,
)
from mcp_server_vector_search_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS


def _numpy_greedy(x: np.ndarray, vec_ids: np.ndarray, k: int):
    """Independent replay with the same floor(1e9 * (xd-cd)^2) quantum."""

    def micro_dist_to(c):
        terms = np.floor(((x - c) * (x - c)) * 1e9).astype(np.int64)
        return terms.sum(axis=1)

    order = np.argsort(vec_ids, kind="stable")
    seed_pos = order[0]
    picked = [int(vec_ids[seed_pos])]
    md = micro_dist_to(x[seed_pos])
    for _ in range(k - 1):
        best = max(range(len(md)), key=lambda i: (md[i], -vec_ids[i]))
        picked.append(int(vec_ids[best]))
        md = np.minimum(md, micro_dist_to(x[best]))
    return picked, int(md.max())


def _corpus(spark):
    rows = (
        load_table(spark, SF_CORRECTNESS, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vec_ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return x, vec_ids


def test_kcenter_matches_numpy_replay(spark):
    x, vec_ids = _corpus(spark)
    want_picks, want_cov = _numpy_greedy(x, vec_ids, KCENTER_K)
    got_picks, got_cov, n = kcenter_select(spark, SF_CORRECTNESS)
    assert got_picks == want_picks
    assert got_cov == want_cov
    assert n == len(vec_ids)


def test_kcenter_coverage_monotone_in_k(spark):
    _, cov2, _ = kcenter_select(spark, SF_CORRECTNESS, k=2)
    _, cov4, _ = kcenter_select(spark, SF_CORRECTNESS, k=4)
    _, cov6, _ = kcenter_select(spark, SF_CORRECTNESS, k=KCENTER_K)
    assert cov2 >= cov4 >= cov6
    assert cov6 > 0  # corpus is not degenerate


def test_kcenter_partition_invariance(spark):
    base = kcenter_select(spark, SF_CORRECTNESS)

    pts = load_table(spark, SF_CORRECTNESS, "embeddings").repartition(13)
    tmp = "/tmp/kcenter_repart"
    pts.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    again = kcenter_select(spark, tmp)
    assert base == again


def test_kcenter_is_2_approx_certificate(spark):
    """Gonzalez guarantees radius <= 2*OPT; equivalently, the k+1st
    farthest distance lower-bounds OPT.  Check the certificate
    relation on real data: coverage(k) <= 4 * coverage(2k) is implied
    by the 2-approx bound only loosely, so instead assert the exact
    invariant the greedy gives us: every selected center is at
    micro-distance >= coverage_radius(k) from the centers picked
    before it (the traversal picks farthest-first)."""
    x, vec_ids = _corpus(spark)
    picks, cov, _ = kcenter_select(spark, SF_CORRECTNESS)
    pos = {int(v): i for i, v in enumerate(vec_ids)}

    def micro(a, b):
        return int(
            np.floor(((a - b) * (a - b)) * 1e9).astype(np.int64).sum()
        )

    for j in range(1, len(picks)):
        d_prev = min(
            micro(x[pos[picks[j]]], x[pos[picks[i]]]) for i in range(j)
        )
        assert d_prev >= cov, (j, d_prev, cov)
