"""Scale-technique operators: sketch error bounds, shuffle-free
bucketed joins, connected-components fixpoint, as-of semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_server_vector_search_spark.operators.components import connected_components
from mcp_server_vector_search_spark.operators.scale import (
    agg_approx_sketches,
    join_bucketed_colocated,
)
from mcp_server_vector_search_spark.operators.temporal import asof_join_latest_order
from mcp_server_vector_search_spark.plans.explain import formatted_plan
from mcp_server_vector_search_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS


def test_approx_sketches_certificate(spark):
    """The accuracy-certificate row: exact counts match an independent
    exact aggregate, and every sketch-within-bounds boolean is TRUE."""
    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    row = agg_approx_sketches(spark, SF_CORRECTNESS).first()
    exact = li.agg(
        F.countDistinct("l_partkey").alias("nd_partkey"),
        F.countDistinct("l_orderkey").alias("nd_orderkey"),
    ).first()
    assert row["nd_partkey"] == exact["nd_partkey"]
    assert row["nd_orderkey"] == exact["nd_orderkey"]
    for flag in ("hll_partkey_ok", "hll_suppkey_ok", "hll_orderkey_ok",
                 "p50_ok", "p99_ok"):
        assert row[flag] is True, flag


def test_bucketed_join_has_no_shuffle(spark):
    """The whole point of the bucketed layout: the fact-fact join reads
    co-bucketed files with NO Exchange on either join side."""
    df = join_bucketed_colocated(spark, SF_CORRECTNESS)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # exactly ONE shuffle in the whole plan — the post-join 5-group
    # aggregation; neither join side may re-shuffle or broadcast
    # (formatted output repeats operators in detail sections, so count
    # within the plan tree block only)
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert "BroadcastExchange" not in tree


def test_connected_components_fixpoint(spark):
    # two chains and a singleton-free isolated pair:
    # {1-2, 2-3, 3-4} -> comp 1 ; {10-11} -> comp 10 ; {20-21, 21-22} -> comp 20
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        ["a_id", "b_id"],
    )
    want = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
    # driver union-find path (default threshold)
    got = {(r["node"], r["comp"]) for r in connected_components(edges).collect()}
    assert got == want
    # distributed min-label path (threshold forced to 0) must agree
    got_dist = {
        (r["node"], r["comp"])
        for r in connected_components(edges, driver_max_edges=0).collect()
    }
    assert got_dist == want


def test_asof_join_null_before_first_order(spark):
    """An event earlier than every order of its user must keep null
    order columns (left as-of semantics), and an event after two orders
    picks the later one."""
    orders = spark.createDataFrame(
        [
            (100, 7, "O", 10.0, "2024-01-10 00:00:00", "1-URGENT"),
            (101, 7, "O", 20.0, "2024-01-20 00:00:00", "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    events = spark.createDataFrame(
        [
            (1, "2024-01-05 00:00:00", 7, "view", 1.0),
            (2, "2024-01-25 00:00:00", 7, "view", 2.0),
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {
        r["event_id"]: (r["last_orderkey"], r["last_totalprice"])
        for r in asof_join_latest_order(events, orders).collect()
    }
    assert rows[1] == (None, None)
    assert rows[2] == (101, 20.0)


def test_gemm_chunked_matches_single_pass(spark):
    """Forcing broadcast-sized build slices (multi-pass block outer
    loop) must produce exactly the single-collect pair set — the 100 TB
    path and the small path are the same math, different blocking."""
    from mcp_server_vector_search_spark.operators.similarity_join import (
        gemm_cosine_pairs,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    # Low threshold so the smoke fixture yields a non-trivial pair set.
    single = {
        (r.a_id, r.b_id, r.cos_sim) for r in gemm_cosine_pairs(emb, 0.15).collect()
    }
    # ~520 B/row → a few-KB cap forces many slices over 500 vectors.
    chunked = {
        (r.a_id, r.b_id, r.cos_sim)
        for r in gemm_cosine_pairs(emb, 0.15, max_broadcast_bytes=16 * 1024).collect()
    }
    assert single == chunked
    assert len(single) > 0


def test_star_cc_matches_union_find_random_graphs(spark):
    """Large-star/small-star must produce exactly the union-find
    labeling on random graphs, including path-shaped components (the
    O(diameter) killer for naive min-label propagation)."""
    import random

    rng = random.Random(1234)
    edges = [(i, i + 1) for i in range(0, 30)]  # one long path
    nodes = list(range(100, 200))
    for _ in range(120):  # random clutter
        a, b = rng.sample(nodes, 2)
        edges.append((a, b))
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    want = {
        (r["node"], r["comp"])
        for r in connected_components(df, driver_max_edges=10**9).collect()
    }
    got = {
        (r["node"], r["comp"])
        for r in connected_components(df, driver_max_edges=0).collect()
    }
    assert got == want and len(got) > 0


def test_kmv_sketch_is_mergeable_and_bounded(spark):
    """KMV invariants: the merged sketch equals bottom-K of the full
    union (mergeability — what makes it shardable at 100 TB), the
    Jaccard estimate is the sketch-agreement ratio, and the union
    estimate is within the textbook multiplicative error for K=64 on
    this corpus."""
    from mcp_server_vector_search_spark.operators.scale import (
        KMV_K,
        agg_kmv_jaccard_certificate,
    )

    row = agg_kmv_jaccard_certificate(spark, SF_CORRECTNESS).collect()[0]
    assert row["k"] == KMV_K
    assert row["sketch_size"] == min(KMV_K, row["union_exact"])
    assert 0 <= row["sketch_agree"] <= row["sketch_size"]
    assert row["jaccard_kmv_micro"] == row["sketch_agree"] * 1_000_000 // row["sketch_size"]
    assert row["kmv_within_bounds"] is True
    # union estimate within 3/sqrt(K) ≈ 37.5% multiplicative error
    assert abs(row["union_est"] - row["union_exact"]) <= 0.375 * row["union_exact"]
    # the sets genuinely differ (guards against a degenerate corpus
    # where the certificate would certify nothing)
    assert 0 < row["inter_exact"] < row["union_exact"]


def test_interval_overlap_matches_naive_join(spark):
    """Bucket decomposition == naive theta-join, verified in-Spark (the
    oracle checks vs DuckDB; this pins engine-internal equivalence and
    that the canonical-bucket dedup trick counts each pair once)."""
    from mcp_server_vector_search_spark import registry

    registry.load_all_operators()
    got = {
        (r["user_id"], str(r["day"]), r["n_concurrent"])
        for r in registry.QUERIES["join_interval_overlap_bucketed"](
            spark, SF_CORRECTNESS
        ).collect()
    }

    from mcp_server_vector_search_spark.operators.temporal import (
        _activity_windows,
    )

    w = _activity_windows(spark, SF_CORRECTNESS)
    a, b = w.alias("a"), w.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e"))
            & (F.col("a.win_id") != F.col("b.win_id")),
            "left",
        )
        .groupBy(F.col("a.user_id").alias("user_id"), F.col("a.day").alias("day"))
        .agg(F.count(F.col("b.win_id")).alias("n_concurrent"))
    )
    want = {
        (r["user_id"], str(r["day"]), r["n_concurrent"]) for r in naive.collect()
    }
    assert got == want and len(got) > 0


def test_preference_pairs_invariants(spark):
    """DPO pair construction: chosen strictly outranks rejected (margin
    >= 0), the two sides never share a document (midpoint guard), and
    the rank<=P filters actually compile to WindowGroupLimit (the
    per-group heap pruning the docstring promises — a fused two-rank
    window silently loses it)."""
    from mcp_server_vector_search_spark import registry
    from mcp_server_vector_search_spark.plans.explain import formatted_plan

    registry.load_all_operators()
    df = registry.QUERIES["build_preference_pairs"](spark, SF_CORRECTNESS)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    assert len(rows) > 0
    chosen = {r["chosen_doc_id"] for r in rows}
    rejected = {r["rejected_doc_id"] for r in rows}
    assert chosen.isdisjoint(rejected)
    assert all(r["margin"] >= 0 for r in rows)
    assert all(r["chosen_q"] >= r["rejected_q"] for r in rows)
    # per-lang pair ranks are 1..P without gaps
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r["lang"]].append(r["pair_rank"])
    for lang, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), lang


def test_incremental_pagerank_warm_start_tracks_cold_rebuild(spark):
    """The rolling form's claim is that 2 warm-started rounds over the
    merged graph track a 4-round cold rebuild of the SAME graph.  Gate:
    the two top-20 hub sets agree on at least 18/20 members at the
    correctness SF (the skewed in-degree hubs dominate both), and the
    warm form ranks every one of its top-20 by descending exact mass."""
    from mcp_server_vector_search_spark.operators.components import (
        PAGERANK_ROUNDS,
        _pagerank_incr_sql,
        _pagerank_iter_sql_t,
        q_graph_pagerank_incremental,
    )

    warm = q_graph_pagerank_incremental(spark, SF_CORRECTNESS).collect()
    ranks = [r["rank_scaled"] for r in warm]
    assert ranks == sorted(ranks, reverse=True)
    # cold rebuild: 4 uniform-start rounds over the identical merged
    # graph (reuse the registered row's shared SQL, swapping the
    # warm-start seed for uniform mass over nodes_all)
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_CORRECTNESS}/documents.parquet'"
    )
    sql = _pagerank_incr_sql("documents")
    # replace the warm seed: i0 becomes uniform over ALL nodes and the
    # incremental chain is extended to the cold rebuild's full depth
    cold_iters = ",\n".join(
        _pagerank_iter_sql_t(
            f"c{i}", f"c{i + 1}", "nodes_all", "edges_all", "deg_all"
        )
        for i in range(PAGERANK_ROUNDS)
    )
    head, _sep, _tail = sql.partition("s0 AS (")
    cold_sql = (
        head
        + f"""c0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes_all),
{cold_iters}
SELECT node AS doc_id, r AS rank_scaled
FROM c{PAGERANK_ROUNDS}
ORDER BY rank_scaled DESC, doc_id
LIMIT 20
"""
    )
    cold = con.sql(cold_sql).fetchall()
    warm_ids = {r["doc_id"] for r in warm}
    cold_ids = {r[0] for r in cold}
    overlap = len(warm_ids & cold_ids)
    assert overlap >= 18, (
        f"warm-start top-20 diverged from cold rebuild: {overlap}/20"
    )


def test_knn_graph_multiblock_matches_single_block(spark):
    """The partial-top-k prune must be invisible: a grid forced to many
    tiny blocks (block_rows=7 → 72 block-pairs at sf0.001) returns the
    IDENTICAL graph to the single-block run, where no pruning happens.
    This is the safety argument for partial-then-merge — one strict
    total order in both stages — exercised on a degenerate geometry the
    registered row never hits."""
    from mcp_server_vector_search_spark.operators.similarity_join import (
        knn_graph_blocked,
    )

    emb = load_table(spark, SF_CORRECTNESS.replace("sf0.01", "sf0.001"), "embeddings")
    tiny = knn_graph_blocked(emb, k=3, block_rows=7).collect()
    single = knn_graph_blocked(emb, k=3, block_rows=1 << 30).collect()
    assert [tuple(r) for r in tiny] == [tuple(r) for r in single]
    n = emb.count()
    per_node = {}
    for r in tiny:
        assert r["a_id"] != r["nbr_id"]
        per_node.setdefault(r["a_id"], []).append(r["rnk"])
    assert len(per_node) == n
    assert all(sorted(v) == [1, 2, 3] for v in per_node.values())


def test_knn_graph_tiny_corpus_edges(spark):
    """Degenerate geometries: a 3-vector corpus with k=5 yields exactly
    n-1 neighbors per node (rnk dense from 1), and a 1-vector corpus
    yields an empty graph (self excluded) — the shapes an incremental
    first epoch actually sees."""
    from mcp_server_vector_search_spark.operators.similarity_join import (
        knn_graph_blocked,
    )

    tiny = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = knn_graph_blocked(tiny, k=5).collect()
    per = {}
    for r in rows:
        assert r["a_id"] != r["nbr_id"]
        per.setdefault(r["a_id"], []).append(r["rnk"])
    assert set(per) == {1, 2, 3}
    assert all(sorted(v) == [1, 2] for v in per.values())
    one = spark.createDataFrame([(7, [1.0, 0.0])], "vec_id long, embedding array<float>")
    assert knn_graph_blocked(one, k=5).count() == 0
