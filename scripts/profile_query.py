"""Standalone per-query profiler for optimization work (r16).

Usage:
  python scripts/profile_query.py NAME [NAME...] [--runs N] [--sf DIR]
      [--plan-dir plans/r16] [--plan-suffix _before]

For each named registered query: optionally captures
``.explain("formatted")`` to ``<plan-dir>/<name><plan-suffix>.txt``,
then times ``--runs`` cold-plan executions (same methodology as
bench.py: build the DataFrame, ``count()`` it, release scratch +
clearCache between runs) and prints min/all timings.

The warmup mirrors bench.py so standalone numbers are comparable to
bench records.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mcp_server_vector_search_spark import registry  # noqa: E402
from mcp_server_vector_search_spark.cache import release_scratch  # noqa: E402
from mcp_server_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--plan-suffix", default="_before")
    args = ap.parse_args()

    spark = get_spark(app_name="profile_query")
    registry.load_all_operators()

    # bench.py-equivalent warmup
    from pyspark.sql import functions as F

    spark.read.parquet(f"{args.sf}/region.parquet").count()
    for warm_tbl, warm_key in (("lineitem", "l_returnflag"), ("orders", "o_orderstatus")):
        spark.read.parquet(f"{args.sf}/{warm_tbl}.parquet").groupBy(warm_key).agg(
            F.count(F.lit(1))
        ).collect()

    from mcp_server_vector_search_spark.plans.explain import formatted_plan

    for name in args.names:
        if name not in registry.QUERIES:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        fn = registry.QUERIES[name]
        if args.plan_dir:
            plan_path = Path(args.plan_dir) / f"{name}{args.plan_suffix}.txt"
            plan_path.parent.mkdir(parents=True, exist_ok=True)
            df = fn(spark, args.sf)
            plan_path.write_text(formatted_plan(df))
            release_scratch()
            spark.catalog.clearCache()
            print(f"# plan -> {plan_path}")
        samples = []
        if args.runs == 0:
            continue  # plan-only capture
        for i in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            n = df.count()
            dt = time.perf_counter() - t0
            samples.append(dt)
            release_scratch()
            spark.catalog.clearCache()
            print(f"# {name} run{i}: {dt:.3f}s ({n} rows)")
        print(f"{name}: min={min(samples):.3f}s runs={[round(s, 3) for s in samples]}")
    spark.stop()


if __name__ == "__main__":
    main()
