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


def test_top2_deflation_is_orthogonal_second_direction(spark):
    """v2 must be (a) numerically orthogonal to v1 — the exact micro
    v1.v2 within quantization of zero — and (b) a genuinely weaker
    direction: per-unit-length Rayleigh mass strictly below v1's."""
    from mcp_server_vector_search_spark.operators.linalg import (
        power_iteration_top_component,
        top2_deflation,
    )

    v1, v2, _pts = top2_deflation(spark, SF_CORRECTNESS)
    dot = sum(a * b for a, b in zip(v1, v2))
    n1 = sum(a * a for a in v1) ** 0.5
    n2 = sum(b * b for b in v2) ** 0.5
    assert abs(dot) / (n1 * n2) < 1e-6, dot

    r1 = power_iteration_top_component(spark, SF_CORRECTNESS).collect()[0]
    from mcp_server_vector_search_spark import registry

    registry.load_all_operators()
    row2 = registry.QUERIES["linalg_top2_deflation"](
        spark, SF_CORRECTNESS
    ).collect()[0]
    r1_unit = r1["rayleigh_micro"] / sum(c * c for c in v1)
    r2_unit = row2["rayleigh2_micro"] / sum(c * c for c in v2)
    # the corpus spectrum is tight (lambda2/lambda1 ~ 0.91 here);
    # the invariant is strict ordering, not a wide gap
    assert r2_unit < r1_unit * 0.999, (r1_unit, r2_unit)
    assert abs(row2["ortho_micro"]) <= 64, row2["ortho_micro"]
