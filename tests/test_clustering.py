"""Distributed Lloyd k-means (operators/clustering.py).

Oracle parity runs wholesale in test_oracle_parity.py; these are the
bespoke properties: partition-count determinism (micro-unit sums are
order-free BY CONSTRUCTION, so reshuffling the input cannot move a
bit), mass conservation, and the map-side plan shape (the assignment
must stay join-free and Python-free — literal centroids, one K-key
exchange).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_server_vector_search_spark.operators.clustering import (
    K_CLUSTERS,
    kmeans_lloyd,
)
from mcp_server_vector_search_spark.plans.explain import formatted_plan
from mcp_server_vector_search_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS


def test_kmeans_mass_conservation_and_shape(spark):
    out = kmeans_lloyd(spark, SF_CORRECTNESS).collect()
    n_total = load_table(spark, SF_CORRECTNESS, "embeddings").count()
    assert sum(r["n_members"] for r in out) == n_total
    assert 1 <= len(out) <= K_CLUSTERS
    assert [r["cluster_id"] for r in out] == sorted(r["cluster_id"] for r in out)
    for r in out:
        assert r["wss_micro"] >= 0
        assert len(r["centroid_microsum"]) == 64


def test_kmeans_partition_count_invariance(spark):
    """Exact integer micro-sums are associative+commutative: running the
    same loop over a repartitioned input must produce byte-identical
    clusters — the property that makes the row value-hashable at any
    parallelism (and on a 1000-executor cluster)."""
    base = kmeans_lloyd(spark, SF_CORRECTNESS).collect()

    pts = load_table(spark, SF_CORRECTNESS, "embeddings").repartition(13)
    tmp = "/tmp/kmeans_repart_embeddings"
    pts.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    again = kmeans_lloyd(spark, tmp).collect()

    assert [tuple(r) for r in base] == [tuple(r) for r in again]


def test_kmeans_assignment_is_map_side(spark):
    """The final pass must be scan -> project(argmin over literal
    centroids) -> partial agg -> ONE exchange -> final agg -> sort:
    no join operator, no Python stage, centroids as plan literals."""
    plan = formatted_plan(kmeans_lloyd(spark, SF_CORRECTNESS))
    assert "Join" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
    # one aggregation exchange + the output-sort exchange, nothing else
    # (formatted plans print each node twice: tree line + detail header)
    import re

    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 2
    assert "array_min" in plan  # the literal-centroid argmin survives codegen


def test_won_gemm_bitwise_agrees_with_hof(spark):
    """The GEMM-dispatched assignment (k >= GEMM_WON_MIN_CELLS) must be
    value-hash-identical to the exact HOF fold: same (dm, cid) struct on
    every row of the real corpus — the contract that lets the trainer
    switch devices without moving a bit."""
    from mcp_server_vector_search_spark.operators.clustering import (
        _points,
        _won_gemm,
        _won_hof,
        train_centroids_distributed,
    )

    pts = _points(spark, SF_CORRECTNESS)
    cents = train_centroids_distributed(pts, k=8, iters=1)
    # pad to 16 jittered centroids so both devices face the GEMM regime
    cents = cents + [
        (cid + 8, [v + 0.01 * (cid + 1) for v in vec]) for cid, vec in cents
    ]
    hof = (
        pts.select("vec_id", _won_hof(cents).alias("w")).collect()
    )
    gemm = (
        pts.select("vec_id", _won_gemm(cents).alias("w")).collect()
    )
    assert {r["vec_id"]: (r["w"]["dm"], r["w"]["cid"]) for r in hof} == {
        r["vec_id"]: (r["w"]["dm"], r["w"]["cid"]) for r in gemm
    }


def test_won_gemm_exact_tie_breaks_on_cid(spark):
    """A point exactly equidistant from two centroids must take the
    lower cluster id on BOTH devices (the lexicographic (dm, cid) min),
    exercising the GEMM path's margin-shortlist reconciliation."""
    from mcp_server_vector_search_spark.operators.clustering import (
        DIM,
        _won_gemm,
        _won_hof,
    )

    mid = [0.5] * DIM
    # 16 centroids; cids 3 and 11 are exact mirror images around mid
    cents = []
    for cid in range(16):
        if cid == 3:
            cents.append((cid, [0.25] * DIM))
        elif cid == 11:
            cents.append((cid, [0.75] * DIM))
        else:
            cents.append((cid, [2.0 + cid] * DIM))
    df = spark.createDataFrame([(1, mid)], "vec_id int, emb array<double>")
    for col in (_won_hof(cents), _won_gemm(cents)):
        row = df.select(col.alias("w")).collect()[0]["w"]
        assert row["cid"] == 3, row


def test_kmeans_ivf_search_semantics(spark):
    """The composition row: k results, query excluded, every hit drawn
    from the NPROBE cells nearest the query, distances ascending, and
    the probed top-k is a superset-consistent slice of the exact
    brute-force ranking restricted to those cells."""
    from mcp_server_vector_search_spark.operators.clustering import (
        NPROBE,
        SEARCH_ITERS,
        SEARCH_K,
        _points,
        _py_dist_micro,
        _won,
        q_cluster_kmeans_ivf_search,
        train_centroids_distributed,
    )

    out = q_cluster_kmeans_ivf_search(spark, SF_CORRECTNESS).collect()
    assert len(out) == SEARCH_K
    dists = [r["dist_micro"] for r in out]
    assert dists == sorted(dists)

    pts = _points(spark, SF_CORRECTNESS)
    qrow = pts.orderBy(F.desc("vec_id")).limit(1).collect()[0]
    qid, qvec = int(qrow["vec_id"]), [float(v) for v in qrow["emb"]]
    assert qid not in {r["vec_id"] for r in out}

    cents = train_centroids_distributed(
        pts, k=8, iters=SEARCH_ITERS
    )
    probes = {
        cid
        for _, cid in sorted(
            (_py_dist_micro(vec, qvec), cid) for cid, vec in cents
        )[:NPROBE]
    }
    cells = {
        r["vec_id"]: r["cid"]
        for r in pts.select("vec_id", _won(cents).alias("won"))
        .select("vec_id", F.col("won.cid").alias("cid"))
        .collect()
    }
    assert all(cells[r["vec_id"]] in probes for r in out)
