"""Streaming smoke tests: the parquet-source → memory/parquet-sink path
drives each streaming operator to completion synchronously.

Correctness of the window logic itself is certified by the
oracle-checked BATCH versions of the same Catalyst expressions
(operators/windows.py); here we verify the streaming machinery —
watermark wiring, state, foreachBatch sink, incremental index layout.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from mcp_server_vector_search_spark.operators.ann import build_ivf_index
from mcp_server_vector_search_spark.sources.tables import load_table
from mcp_server_vector_search_spark.streaming import ingest

from .conftest import SF_SMOKE


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_windowed_counts_stream_matches_batch(spark):
    stream = ingest.read_event_stream(spark, SF_SMOKE)
    name = f"wc_{uuid.uuid4().hex[:8]}"
    _run_to_memory(ingest.windowed_counts(stream), name)
    got = {
        (r.win_start, r.event_type): r.n_events
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = ingest.windowed_counts(load_table(spark, SF_SMOKE, "events")).collect()
    want = {(r.win_start, r.event_type): r.n_events for r in batch}
    # append mode emits only watermark-finalized windows; everything
    # emitted must match the batch computation exactly
    assert got
    assert all(want.get(k) == v for k, v in got.items())


def test_session_windows_stream_runs(spark):
    stream = ingest.read_event_stream(spark, SF_SMOKE)
    name = f"sw_{uuid.uuid4().hex[:8]}"
    _run_to_memory(ingest.session_windows(stream), name)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert rows and all(r.n_events > 0 for r in rows)


def test_incremental_index_append_prunable(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    _, centroids = build_ivf_index(emb)
    with tempfile.TemporaryDirectory() as tmp:
        q = ingest.incremental_index_append(
            spark, SF_SMOKE, centroids, f"{tmp}/index", f"{tmp}/ckpt"
        )
        q.awaitTermination(120)
        indexed = spark.read.parquet(f"{tmp}/index")
        assert indexed.count() == emb.count()
        assert "centroid_id" in indexed.columns
        # the layout must actually be partitioned (directory per cell)
        import os

        parts = [d for d in os.listdir(f"{tmp}/index") if d.startswith("centroid_id=")]
        assert len(parts) > 1
        # pruned read touches a subset
        one = indexed.where(F.col("centroid_id") == int(parts[0].split("=")[1]))
        assert 0 < one.count() < emb.count()
