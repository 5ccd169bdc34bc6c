"""DuckDB oracle harness mimicking the driver's correctness gate.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB at sf0.01, then compares row-count + schema + order-insensitive
value-hash with columns sorted by name (``__spark_entry__.py`` docstring).
This module reproduces that comparison so every registered query is
validated in CI before the driver ever sees it.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from mcp_server_vector_search_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb -0.0 vs 0.0 only; values themselves must match exactly
        return v + 0.0
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def canonical(rows: list, colnames: list[str]):
    """Rows as a sorted multiset with columns ordered by name."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    mat = [tuple(_norm(row[i]) for i in order) for row in rows]
    return sorted(mat, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}")
    sc, dc = canonical(s_rows, s_cols), canonical(d_rows, d_cols)
    if sc != dc:
        diff_s = [r for r in sc if r not in dc][:3]
        diff_d = [r for r in dc if r not in sc][:3]
        problems.append(
            f"value mismatch: {len([r for r in sc if r not in dc])} spark-only rows, "
            f"e.g. spark-only={diff_s} duckdb-only={diff_d}"
        )
    return problems
