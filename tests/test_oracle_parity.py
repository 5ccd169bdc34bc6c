"""The driver-gate rehearsal: every registered query vs its DuckDB oracle.

Parametrized over the registry so newly added operators are picked up
automatically; queries registered without an oracle get a rows-run
smoke check instead (mirroring the driver's weaker rows-only record).
"""

from __future__ import annotations

import pytest

from mcp_server_vector_search_spark import registry

from .conftest import SF_CORRECTNESS
from .oracle import compare, duckdb_connection

registry.load_all_operators()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_connection(SF_CORRECTNESS)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_parity(name, spark, oracle_con):
    df = registry.QUERIES[name](spark, SF_CORRECTNESS)
    if name in registry.ORACLES:
        problems = compare(df, oracle_con, registry.ORACLES[name])
        assert not problems, f"{name}: " + "; ".join(problems)
    else:
        # rows-only check (approximate operators) — must run and be well-formed
        rows = df.collect()
        assert rows is not None and len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    out = e.entry(spark).collect()
    assert len(out) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
