"""Query/oracle registry wired into ``__spark_entry__.py``.

Every operator registers a named query (``fn(spark, sf_dir) ->
DataFrame``) and the equivalent DuckDB oracle SQL.  Approximate
operators (IVF/PQ/SRP ANN) are oracle-checked too: their training
stages are deterministic driver-side numpy, re-run at registration
time and folded into the SQL as literals (see functions/train.py).
A query registered with ``oracle=None`` falls back to the driver's
weaker rows-only record.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Decorator: register ``fn(spark, sf_dir)`` under ``name``.

    ``oracle`` is ANSI-ish SQL DuckDB can run against the pre-registered
    testdata views; column names/aliases MUST match the Spark result
    (the driver sorts columns by name before value-hashing).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so registrations run."""
    from .operators import (  # noqa: F401
        analytics,
        ann,
        clustering,
        components,
        coreset,
        curation,
        data_selection,
        dedup,
        engine_queries,
        extensions,
        graph_ann,
        hybrid,
        ivfpq,
        late_interaction,
        lifecycle,
        linalg,
        matryoshka,
        opq,
        pipeline,
        pq,
        relational,
        sampling,
        scale,
        similarity_join,
        sq,
        temporal,
        text_analysis,
        timeseries,
        topk,
        tpch_extra,
        tpch_wave4,
        tpch_wave5,
        vsearch_extra,
        web_curation,
        windows,
    )
    from .sources import (  # noqa: F401
        avro_source,
        formats,
        layout,
        multimodal,
        pysource,
    )
    from .streaming import ingest, stateful  # noqa: F401
