"""Graph-curation operators beyond the oracle gate: invariants the
value-hash cannot see (convergence certificates, structural bounds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_server_vector_search_spark.operators.components import (
    KCORE_K,
    KCORE_ROUNDS,
    _kcore_edges_sql,
    _kcore_round_sql_t,
    q_graph_kcore_membership,
)

from .conftest import SF_CORRECTNESS


def test_kcore_convergence_certificate(spark):
    """min(core_degree) >= K holds iff the bounded peel reached the
    true fixpoint — the output-embedded convergence certificate the
    docstring promises.  Also: the core is non-empty and non-vacuous
    (strictly smaller than the corpus), so the K constant actually
    peels on the gate corpus instead of passing trivially."""
    out = q_graph_kcore_membership(spark, SF_CORRECTNESS)
    row = out.agg(
        F.min("core_degree").alias("mind"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row["mind"] >= KCORE_K, (
        f"bounded {KCORE_ROUNDS}-round peel did not converge: a node "
        f"survives with degree {row['mind']} < {KCORE_K}"
    )
    n_docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet").count()
    assert 0 < row["n"] < n_docs, (
        f"k-core is vacuous: {row['n']} members of {n_docs} docs"
    )


def test_kcore_is_fixpoint_one_more_round_removes_nothing(spark):
    """Run ONE extra peel round on the converged core: the removal set
    must be empty — the direct fixpoint check, independent of the
    degree-based certificate above."""
    out = q_graph_kcore_membership(spark, SF_CORRECTNESS)
    # rebuild the surviving edge set: edges whose both endpoints are in
    # the core, from the same synthesized graph
    n = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet").count()
    spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet").createOrReplaceTempView(
        "__kct_docs"
    )
    edges = spark.sql(_kcore_edges_sql("__kct_docs d", str(n)))
    core = out.select(F.col("doc_id").alias("node"))
    surv = (
        edges.join(core.withColumnRenamed("node", "u"), "u")
        .join(core.withColumnRenamed("node", "v"), "v")
        .select("u", "v")
    )
    surv.createOrReplaceTempView("__kct_surv")
    removed = spark.sql(
        f"WITH {_kcore_round_sql_t('__kct_surv', '__kct_deg', '__kct_rm', '__kct_nxt')}\n"
        "SELECT COUNT(*) AS c FROM __kct_rm"
    ).collect()[0]["c"]
    assert removed == 0, f"one more round would remove {removed} nodes"
