"""Distributed power iteration (operators/linalg.py).

Oracle parity runs wholesale in test_oracle_parity.py; these pin the
algorithmic properties: the iterate actually converges toward the top
principal direction (Rayleigh mass grows vs the raw axis start), and
partitioning cannot move a bit (micro-unit sums are order-free by
construction).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from mcp_server_vector_search_spark.operators.linalg import (
    _row_dot_micro,
    power_iteration_top_component,
)
from mcp_server_vector_search_spark.plans.explain import formatted_plan
from mcp_server_vector_search_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS


def _rayleigh_under(spark, v):
    pts = load_table(spark, SF_CORRECTNESS, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("emb")
    )
    e = F.col("su").cast("double") / F.lit(1000000000.0)
    return (
        pts.select(_row_dot_micro(v).alias("su"))
        .groupBy()
        .agg(F.sum(F.floor((e * e) * F.lit(1000000000.0))).alias("r"))
        .collect()[0]["r"]
    )


def test_power_iteration_converges(spark):
    row = power_iteration_top_component(spark, SF_CORRECTNESS).collect()[0]
    comp = [c / 1e9 for c in row["component_micro"]]
    assert max(abs(c) for c in comp) <= 1.0 + 1e-9  # max-normalized
    # the final direction must capture (much) more variance than the
    # raw first-axis start the iteration began from
    r_axis = _rayleigh_under(spark, [1.0] + [0.0] * 63)
    # compare per unit length: the axis start has norm 1, the max-norm
    # iterate does not — scale its Rayleigh mass down by |v|^2
    norm_sq = sum(c * c for c in comp)
    assert row["rayleigh_micro"] / norm_sq > r_axis * 1.5
    assert row["n_rows"] == load_table(spark, SF_CORRECTNESS, "embeddings").count()


def test_power_iteration_partition_invariance(spark):
    base = power_iteration_top_component(spark, SF_CORRECTNESS).collect()

    pts = load_table(spark, SF_CORRECTNESS, "embeddings").repartition(13)
    tmp = "/tmp/power_iter_repart"
    pts.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    again = power_iteration_top_component(spark, tmp).collect()

    assert [tuple(r) for r in base] == [tuple(r) for r in again]


def test_power_iteration_plan_is_single_row_reduce(spark):
    plan = formatted_plan(power_iteration_top_component(spark, SF_CORRECTNESS))
    assert "Join" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
    # global agg: partial -> single-partition exchange -> final
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 1
