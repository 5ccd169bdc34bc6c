"""Audit every registered query's output schema for driver-hostile types.

The driver canonicalizer sorts/hashes pandas cells; array/map/struct
cells are unhashable and fail hard (round-1: vector_centroid_per_label).
This sweep builds each query's DataFrame at the smoke SF and flags any
complex-typed output column so regressions are caught before the driver.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, MapType, StructType

sys.path.insert(0, "/root/repo")

from mcp_server_vector_search_spark import registry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("sweep-schemas")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    registry.load_all_operators()
    bad: list[tuple[str, str]] = []
    errs: list[tuple[str, str]] = []
    for name, fn in sorted(registry.QUERIES.items()):
        try:
            df = fn(spark, SF_DIR)
            complex_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                bad.append((name, ", ".join(complex_cols)))
        except Exception as e:  # noqa: BLE001
            errs.append((name, repr(e)[:200]))
    print(f"checked {len(registry.QUERIES)} queries")
    for name, cols in bad:
        print(f"COMPLEX OUTPUT  {name}: {cols}")
    for name, err in errs:
        print(f"BUILD ERROR     {name}: {err}")
    if not bad and not errs:
        print("all outputs scalar-typed")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
