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


def test_zorder_layout_bounds_both_dimensions(spark):
    """Z-order clustering on (l_partkey, l_suppkey) must shrink the
    per-file footer bounding box in BOTH dimensions — the property that
    lets a predicate on either column skip files.  A layout sorted on
    l_partkey alone leaves every file spanning ~the full suppkey range."""
    from mcp_server_vector_search_spark.sources.layout import write_zorder_layout

    li = load_table(spark, SF_CORRECTNESS, "lineitem")

    def mean_span(path, col, domain):
        ranges = file_minmax_ranges(path, col)
        assert ranges, "footer stats missing"
        return sum(hi - lo for lo, hi in ranges) / len(ranges) / domain

    dom = {
        c: (li.agg(F.max(c)).first()[0] - li.agg(F.min(c)).first()[0])
        for c in ("l_partkey", "l_suppkey")
    }
    with tempfile.TemporaryDirectory() as tmp:
        zpath = f"{tmp}/z"
        write_zorder_layout(li, zpath, ["l_partkey", "l_suppkey"], n_files=16)
        spath = f"{tmp}/s"
        write_sorted_layout(li, spath, ["l_partkey"], n_files=16)

        z_part = mean_span(zpath, "l_partkey", dom["l_partkey"])
        z_supp = mean_span(zpath, "l_suppkey", dom["l_suppkey"])
        s_supp = mean_span(spath, "l_suppkey", dom["l_suppkey"])

        # z-order bounds both dims well below the full span...
        assert z_part < 0.5 and z_supp < 0.5, (z_part, z_supp)
        # ...while single-key sort leaves the second dim unclustered
        assert s_supp > 0.9, s_supp
        # and z-order's second-dim clustering beats single-key sort's
        assert z_supp < s_supp / 2

        # round-trip fidelity
        back = spark.read.parquet(zpath)
        assert back.count() == li.count()
