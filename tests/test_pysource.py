"""Custom Python data source: partition planning must mirror the
file's row groups and the scan must reproduce the JVM reader's rows."""

from __future__ import annotations

from mcp_server_vector_search_spark.sources.pysource import (
    RowGroupReader,
    register_pysource,
)

from .conftest import SF_CORRECTNESS


def test_partitions_are_row_groups():
    import pyarrow.parquet as pq

    path = f"{SF_CORRECTNESS}/documents.parquet"
    reader = RowGroupReader(path)
    assert len(reader.partitions()) == pq.ParquetFile(path).metadata.num_row_groups


def test_pysource_rows_match_native_scan(spark):
    path = f"{SF_CORRECTNESS}/documents.parquet"
    register_pysource(spark)
    via_py = spark.read.format("pyrowgroup").option("path", path).load()
    native = spark.read.parquet(path)
    assert via_py.schema == native.schema
    a = {tuple(r) for r in via_py.collect()}
    b = {tuple(r) for r in native.collect()}
    assert a == b and len(a) > 0
