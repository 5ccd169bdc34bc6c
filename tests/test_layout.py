"""Sorted-layout and compaction: prove the physical claims from the
parquet footers (no full scans needed)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from mcp_server_vector_search_spark.sources.layout import (
    compact,
    file_minmax_ranges,
    write_sorted_layout,
)
from mcp_server_vector_search_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS


def test_sorted_layout_files_are_disjoint_slices(spark):
    """After clustering on l_shipdate, each file's [min,max] footer range
    must be narrow and non-overlapping — the property file/row-group
    skipping needs.  An unsorted write has every file spanning ~the
    whole key range."""
    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    with tempfile.TemporaryDirectory() as tmp:
        sorted_path = f"{tmp}/sorted"
        write_sorted_layout(li, sorted_path, ["l_shipdate"], n_files=8)
        ranges = file_minmax_ranges(sorted_path, "l_shipdate")
        assert len(ranges) == 8
        ordered = sorted(ranges)
        for (lo1, hi1), (lo2, hi2) in zip(ordered, ordered[1:]):
            assert hi1 <= lo2  # non-overlapping slices

        # contrast: the unsorted layout overlaps on ~every file pair
        unsorted_path = f"{tmp}/unsorted"
        li.repartition(8).write.parquet(unsorted_path)
        u = file_minmax_ranges(unsorted_path, "l_shipdate")
        overlaps = sum(
            1
            for i, (lo1, hi1) in enumerate(u)
            for lo2, hi2 in u[i + 1 :]
            if max(lo1, lo2) <= min(hi1, hi2)
        )
        assert overlaps > 0

        # round-trip fidelity: the clustered copy is the same table
        back = spark.read.parquet(sorted_path)
        assert back.count() == li.count()
        a = back.agg(F.sum(F.col("l_extendedprice").cast("decimal(14,2)"))).first()[0]
        b = li.agg(F.sum(F.col("l_extendedprice").cast("decimal(14,2)"))).first()[0]
        assert a == b


def test_compaction_reduces_file_count(spark):
    li = load_table(spark, SF_CORRECTNESS, "lineitem").limit(10000)
    with tempfile.TemporaryDirectory() as tmp:
        landing = f"{tmp}/landing"
        li.repartition(64).write.parquet(landing)  # small-files landing zone
        import pathlib

        n_small = len(list(pathlib.Path(landing).glob("*.parquet")))
        assert n_small == 64
        compacted = f"{tmp}/compacted"
        n_files = compact(spark, landing, compacted, target_rows_per_file=5000)
        assert n_files == 2
        n_big = len(list(pathlib.Path(compacted).glob("*.parquet")))
        assert n_big == 2
        assert spark.read.parquet(compacted).count() == 10000
