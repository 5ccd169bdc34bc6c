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


def _ddl_schema(path: str, columns: list[str] | None = None) -> str:
    """DDL schema string from the parquet footer (planning-time
    metadata read; no row data touched).  ``columns`` restricts and
    orders the projection — the connector's explicit column-pruning
    contract (the Python DataSource API has no automatic pruning hook
    in Spark 4.1, so projection pushdown is by configuration, exactly
    like a JDBC ``query`` option)."""
    import pyarrow.parquet as pq

    schema_arrow = pq.ParquetFile(path).schema_arrow
    if columns is not None:
        # Schema.field raises KeyError for a name not in the file —
        # a misprojected option fails at planning, never mid-scan
        schema_arrow = [schema_arrow.field(c) for c in columns]
    fields = []
    for f in schema_arrow:
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
    def __init__(self, path: str, columns: list[str] | None = None):
        self.path = path
        self.columns = columns

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).metadata.num_row_groups
        return [RowGroupPartition(i) for i in range(n)]

    def read(self, partition):
        import pyarrow.parquet as pq

        # Column pruning happens HERE, at the parquet column-chunk
        # level: unprojected chunks are never decompressed and never
        # cross the Arrow boundary.  On the documents table the text
        # column is ~98% of the bytes — for the registered aggregate
        # (lang, n_chars) the projected scan moves ~2% of the file.
        table = pq.ParquetFile(self.path).read_row_group(
            partition.row_group, columns=self.columns
        )
        yield from table.to_batches()


class RowGroupDataSource(DataSource):
    """``spark.read.format("pyrowgroup").option("path", ...)``; an
    optional comma-separated ``columns`` option projects at the
    parquet column-chunk level (see ``_ddl_schema``)."""

    def _columns(self) -> list[str] | None:
        cols = self.options.get("columns")
        return [c.strip() for c in cols.split(",")] if cols else None

    @classmethod
    def name(cls) -> str:
        return "pyrowgroup"

    def schema(self) -> str:
        return _ddl_schema(self.options["path"], self._columns())

    def reader(self, schema) -> DataSourceReader:
        return RowGroupReader(self.options["path"], self._columns())


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
    which is the honest cost model for any Python-backed connector.
    The ``columns`` option projects to the two aggregated columns at
    the column-chunk level, so the text column (~98% of the file's
    bytes) is never decompressed — full-schema row fidelity is covered
    separately by tests/test_pysource.py.

    Cost profile (r6 bench regression investigated, r7): the steady
    cost of this scan is ~0.45 s; the ~3-5 s bench number is one-time
    Python-source worker + plan bootstrap, paid by whichever pyrowgroup
    read runs first in the session.  bench.py therefore warms the
    Python-source pool in its warmup step, the same amortization it
    already applies to the JVM."""
    from pyspark.sql import functions as F

    register_pysource(spark)
    d = (
        spark.read.format("pyrowgroup")
        .option("path", f"{sf_dir}/documents.parquet")
        .option("columns", "lang,n_chars")
        .load()
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
