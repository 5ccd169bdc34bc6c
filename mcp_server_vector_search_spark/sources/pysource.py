"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API):
a parquet reader whose INPUT PARTITIONS are the file's row groups.

The reference's only "source" is a Neo4j driver call (reference
`server.py:60-78`); this module demonstrates the engine's extension
surface for sources Spark has no built-in reader for (proprietary
formats, services, feeds).  The contract mirrors what every scalable
connector must provide:

- ``partitions()`` — planning-time work division.  Here: one input
  partition per parquet ROW GROUP, the natural parallel unit a real
  columnar connector exposes (footer metadata only — no data read at
  planning).
- ``read(partition)`` — executor-side, yields **pyarrow record
  batches** (the Arrow fast path: batches cross the Python↔JVM
  boundary columnar, never row-at-a-time Python objects).

Python sources are the engine's escape hatch, not its default path —
a format parquet/ORC/CSV/JDBC already covers should use the JVM
reader (predicate pushdown, codegen).  The value here is the
*pattern*: partition planning + Arrow-batch emission is exactly how
one wraps e.g. a tile server, a tape archive, or a bespoke binary
format into distributed scans.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "binary": "binary",
    "large_binary": "binary",
}


def _ddl_schema(path: str) -> str:
    """DDL schema string from the parquet footer (planning-time
    metadata read; no row data touched)."""
    import pyarrow.parquet as pq

    fields = []
    for f in pq.ParquetFile(path).schema_arrow:
        t = str(f.type)
        if t.startswith("list<item: ") and t.endswith(">"):
            inner = _ARROW_TO_DDL.get(t[len("list<item: ") : -1])
            if inner is None:
                raise ValueError(f"unsupported arrow list type: {t}")
            ddl = f"array<{inner}>"
        else:
            ddl = _ARROW_TO_DDL.get(t)
            if ddl is None:
                raise ValueError(f"unsupported arrow type: {t}")
        fields.append(f"{f.name} {ddl}")
    return ", ".join(fields)


class RowGroupPartition(InputPartition):
    def __init__(self, row_group: int):
        self.row_group = row_group


class RowGroupReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).metadata.num_row_groups
        return [RowGroupPartition(i) for i in range(n)]

    def read(self, partition):
        import pyarrow.parquet as pq

        table = pq.ParquetFile(self.path).read_row_group(partition.row_group)
        yield from table.to_batches()


class RowGroupDataSource(DataSource):
    """``spark.read.format("pyrowgroup").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "pyrowgroup"

    def schema(self) -> str:
        return _ddl_schema(self.options["path"])

    def reader(self, schema) -> DataSourceReader:
        return RowGroupReader(self.options["path"])


def register_pysource(spark) -> None:
    """Idempotent registration of the custom format on a session."""
    key = "__pyrowgroup_registered__"
    if not getattr(spark, key, False):
        spark.dataSource.register(RowGroupDataSource)
        setattr(spark, key, True)


from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from ..registry import register  # noqa: E402


@register(
    "source_python_datasource",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table read through the CUSTOM Python source, then
    aggregated — hash-matching the oracle's direct parquet read proves
    the source's partition planning and Arrow-batch emission preserve
    every row and value exactly.

    The aggregate runs JVM-side on the Arrow-materialized scan; only
    the scan itself crosses the Python boundary (batched, columnar) —
    which is the honest cost model for any Python-backed connector."""
    from pyspark.sql import functions as F

    register_pysource(spark)
    d = (
        spark.read.format("pyrowgroup")
        .option("path", f"{sf_dir}/documents.parquet")
        .load()
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
