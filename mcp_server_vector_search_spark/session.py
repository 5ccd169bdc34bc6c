"""SparkSession factory tuned for this engine.

Local mode is a single JVM; on a real cluster the same confs apply per
executor.  Every knob here exists for a scale reason:

- AQE on: runtime coalescing of post-shuffle partitions and skew-join
  splitting — the 100 TB path depends on it (skewed similarity-join
  outputs, LSH bucket skew).
- shuffle.partitions sized to cores locally; at cluster scale this would
  be ~2-3x total cores (AQE coalesces down, so erring high is safe).
- Arrow on: every Pandas-UDF boundary (embedder, multimodal decode) is
  Arrow-batched, never row-at-a-time pickle.
- UTC session timezone: deterministic timestamp semantics, and parity
  with the DuckDB oracle (UTC-naive timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mcp_server_vector_search_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores.  On a real
    cluster the ``master`` would come from the environment; local[N] is
    only the test harness.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
