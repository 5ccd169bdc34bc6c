"""Scale-stress suite (round-6 verdict #1): a seeded ~10× corpus
(50k docs / 20k vectors — see tests/scale_corpus.py) with PLANTED
ground truth, exercising exactly the code that only matters at 100 TB:

- the GEMM build-side slicer's multi-slice outer loop
  (similarity_join.gemm_cosine_pairs, n_slices > 1) against a blocked
  numpy ground truth, not just against another Spark run;
- MinHash-LSH recall at real candidate volume vs the planted pair set
  (the s-curve bound, not a fixture coincidence);
- the PPJoin prefix filter's exactness at 50k docs (recall == 1.0 on
  planted near-dups by construction of the algorithm);
- the distributed large-star/small-star connected-components rounds on
  a long-path graph (the O(diameter) killer) at real size;
- IVF-PQ recall@10 vs exact brute force on clustered vectors;
- the composed corpus-build pipeline end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcp_server_vector_search_spark.operators.components import (
    connected_components,
)
from mcp_server_vector_search_spark.operators.dedup import (
    JACCARD_T,
    MINHASH_VERIFY_T,
    dedup_jaccard_prefix_filter,
    dedup_minhash_lsh,
)
from mcp_server_vector_search_spark.operators.similarity_join import (
    gemm_cosine_pairs,
)
from mcp_server_vector_search_spark.sources.tables import load_table

from .scale_corpus import SCALE_DIR, build_scale_corpus

pytestmark = pytest.mark.scale


@pytest.fixture(scope="module")
def scale():
    meta = build_scale_corpus()
    return str(SCALE_DIR), meta


def _load_vectors(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    V = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    return ids, V


def _exact_pair_set(V, threshold, decimals=6, block=2048):
    """Blocked numpy ground truth: all (a < b) with rounded cosine
    strictly above threshold.  HALF_UP rounding like F.round."""
    n = V.shape[0]
    norms = np.linalg.norm(V, axis=1)
    p = 10.0**decimals
    out = set()
    for i0 in range(0, n, block):
        A = V[i0 : i0 + block]
        sims = (A @ V.T) / np.outer(norms[i0 : i0 + block], norms)
        sims = np.sign(sims) * np.floor(np.abs(sims) * p + 0.5) / p
        ai, bi = np.nonzero(sims > threshold)
        for a, b in zip(ai.tolist(), bi.tolist()):
            ga = i0 + a
            if ga < b:
                out.add((ga, b))
    return out


def test_gemm_multislice_matches_ground_truth(spark, scale):
    """The >1-slice branch (persist + per-slice collect/broadcast +
    probe rescans) at 20k vectors must equal the exact blocked-numpy
    pair set AND contain every planted near-identical pair."""
    sf_dir, meta = scale
    emb = load_table(spark, sf_dir, "embeddings")
    # 20k rows * 528 B ≈ 10.6 MB → a 4 MB bound forces 3 slices.
    got = {
        (r.a_id, r.b_id)
        for r in gemm_cosine_pairs(
            emb, 0.8, max_broadcast_bytes=4 * 1024 * 1024
        ).collect()
    }
    _, V = _load_vectors(spark, sf_dir)
    want = _exact_pair_set(V, 0.8)
    assert got == want
    planted = {tuple(p) for p in meta["vec_pairs"]}
    assert planted <= got
    # sanity: the corpus produced non-planted true pairs too, so the
    # equality above tested more than the planted set
    assert len(want) > len(planted)


def test_minhash_lsh_recall_on_planted_pairs(spark, scale):
    """LSH recall at 50k docs: planted near-dups have distinct-token
    Jaccard n/(n+1) ≥ 0.96, so the 2-band×8-row s-curve admits ≥ ~95%
    of them; assert ≥ 0.9 with slack, exactness of the verify filter,
    and that every planted EXACT duplicate (j=1, band-hit certain) is
    found."""
    sf_dir, meta = scale
    out = dedup_minhash_lsh(spark, sf_dir)
    rows = out.collect()
    got = {(r["a_id"], r["b_id"]) for r in rows}
    assert all(r["jaccard"] >= MINHASH_VERIFY_T for r in rows)
    near = {tuple(p) for p in meta["near_pairs"]}
    exact = {tuple(p) for p in meta["exact_pairs"]}
    assert exact <= got  # j=1.0 pairs can never miss a band
    recall = len(near & got) / len(near)
    assert recall >= 0.9, f"LSH recall {recall:.3f} below s-curve floor"


def test_prefix_filter_exact_at_scale(spark, scale):
    """PPJoin prefix filtering is EXACT — at 50k docs every planted
    pair (shingle Jaccard ≥ (n-2)/(n-1) ≫ t) must be found, recall
    1.0, no sampling, no s-curve."""
    sf_dir, meta = scale
    out = dedup_jaccard_prefix_filter(spark, sf_dir)
    rows = out.collect()
    got = {(r["a_id"], r["b_id"]) for r in rows}
    assert all(r["jaccard"] >= JACCARD_T for r in rows)
    planted = {tuple(p) for p in meta["near_pairs"]} | {
        tuple(p) for p in meta["exact_pairs"]
    }
    missing = planted - got
    assert not missing, f"exact algorithm missed {len(missing)} planted pairs"


def test_distributed_cc_long_path_at_scale(spark):
    """Large-star/small-star on a 30k-node graph with 3000-long path
    components (the O(diameter) shape naive propagation cannot finish)
    must converge within MAX_ITER and match union-find exactly."""
    rng = np.random.default_rng(7)
    edges = [(i, i + 1) for i in range(0, 3000)]
    edges += [(10_000 + i, 10_000 + i + 1) for i in range(0, 3000)]
    a = rng.integers(20_000, 50_000, size=20_000)
    b = rng.integers(20_000, 50_000, size=20_000)
    edges += [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    want = {
        (r["node"], r["comp"])
        for r in connected_components(df, driver_max_edges=10**9).collect()
    }
    got = {
        (r["node"], r["comp"])
        for r in connected_components(df, driver_max_edges=0).collect()
    }
    assert got == want
    # the path components collapsed to their minimum label
    assert (0, 0) in got and (3000, 0) in got
    assert (10_000, 10_000) in got and (13_000, 10_000) in got


def test_distributed_cc_on_real_dedup_pairs(spark, scale):
    """The distributed CC path over the ACTUAL near-dup pair output at
    50k docs (the composition a 100 TB dedup job runs) agrees with
    driver union-find."""
    sf_dir, _ = scale
    pairs = dedup_jaccard_prefix_filter(spark, sf_dir).select("a_id", "b_id")
    pairs = pairs.persist()
    try:
        want = {
            (r["node"], r["comp"])
            for r in connected_components(pairs, driver_max_edges=10**9).collect()
        }
        got = {
            (r["node"], r["comp"])
            for r in connected_components(pairs, driver_max_edges=0).collect()
        }
    finally:
        pairs.unpersist()
    assert got == want and len(got) > 0


def test_ivfpq_recall_at_scale(spark, scale):
    """IVF-PQ (residual ADC + exact re-rank) recall@10 ≥ 0.9 averaged
    over seeded in-distribution queries against exact brute force.

    The rerank pool is sized to the probed corpus (~8% of probed rows —
    see ivfpq_topk's docstring): the constant default pool of 100 is a
    fixture-scale setting and measurably fails here (recall 0.36),
    which is exactly the scale lesson this suite exists to pin."""
    from mcp_server_vector_search_spark.operators.ivfpq import (
        ivfpq_topk,
        load_or_build_ivfpq_index,
    )

    sf_dir, _ = scale
    index, cents, books = load_or_build_ivfpq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    ids, V = _load_vectors(spark, sf_dir)
    norms = np.linalg.norm(V, axis=1)
    rng = np.random.default_rng(99)
    recalls = []
    for _ in range(5):
        j = int(rng.integers(0, len(ids)))
        q = V[j] + rng.normal(scale=0.01, size=V.shape[1])
        sims = (V @ q) / (norms * np.linalg.norm(q))
        true_top = set(
            ids[np.lexsort((ids, -sims))[:10]].tolist()
        )
        got = {
            r["vec_id"]
            for r in ivfpq_topk(
                index, emb, cents, books, [float(x) for x in q], k=10,
                rerank=1024,
            ).collect()
        }
        recalls.append(len(true_top & got) / 10.0)
    mean_recall = float(np.mean(recalls))
    assert mean_recall >= 0.9, f"recall@10 {mean_recall:.2f} ({recalls})"


def test_pipeline_build_corpus_at_scale(spark, scale):
    """The composed chunk→gate→split→dedup pipeline runs end-to-end at
    50k docs: planted verbatim duplicate docs must collapse (their
    chunks share fingerprints), splits are exhaustive, and the keep
    rule is the group minimum."""
    from mcp_server_vector_search_spark.operators.pipeline import (
        pipeline_build_corpus,
    )

    sf_dir, meta = scale
    out = pipeline_build_corpus(spark, sf_dir).persist()
    try:
        n = out.count()
        assert n > 0
        splits = {r["split"] for r in out.select("split").distinct().collect()}
        assert splits <= {"train", "val", "test"} and "train" in splits
        # at least one planted exact-dup doc pair collapsed into a
        # shared fingerprint group (same split for some chunk pair)
        dup_keeps = {p[0] for p in meta["exact_pairs"]}
        collapsed = out.where(
            (F.col("n_members") >= 2) & F.col("keep_doc").isin(dup_keeps)
        ).count()
        assert collapsed > 0
        # keep rule: the kept (doc, chunk) is a member, so keep_doc is
        # always a valid doc id
        bad = out.where(
            (F.col("keep_doc") < 0) | (F.col("keep_doc") >= 50_000)
        ).count()
        assert bad == 0
    finally:
        out.unpersist()


def test_semdedup_at_scale_cluster_bound_and_planted_recall(spark, scale):
    """SemDeDup on the 20k clustered vectors: (a) the candidate-pair
    space actually contracts to Σ|cell|² — the operator's whole scaling
    claim — and (b) at a tight threshold the drop set recovers the 200
    planted near-identical pairs (cosine ≈ 0.9999; cluster-mates sit
    near 0.6 and must NOT be dropped)."""
    from mcp_server_vector_search_spark.operators.ann import (
        TRAIN_SAMPLE,
        assignment_expr,
        train_centroids,
    )
    from mcp_server_vector_search_spark.operators.data_selection import (
        semdedup_dropped,
    )

    sf_dir, meta = scale
    # Subsample to bound test wall-clock: keep base vectors < 4000 plus
    # every planted duplicate (their sources are vec_id = i*7 < 1400,
    # so all 200 planted pairs survive intact).  The candidate-pair
    # contraction and recall claims are size-invariant.
    emb = load_table(spark, sf_dir, "embeddings").where(
        (F.col("vec_id") < 4000) | (F.col("vec_id") >= 19800)
    )
    cents = train_centroids(
        [
            [float(v) for v in r["embedding"]]
            for r in emb.orderBy("vec_id").limit(TRAIN_SAMPLE).select("embedding").collect()
        ]
    )
    assigned = emb.withColumn("centroid_id", assignment_expr(cents))

    # (a) the cluster bound: Σ|cell|² must be far below n² (here the
    # 16-cell quantizer caps it at ~n²/16 even in the worst skew we see)
    sizes = [r["n"] for r in assigned.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()]
    n = sum(sizes)
    assert sum(s * s for s in sizes) < (n * n) / 8

    # (b) planted-pair recovery at a threshold above cluster-mate cosine
    dropped = {
        r["vec_id"] for r in semdedup_dropped(assigned, threshold=0.99).collect()
    }
    planted = {b for _, b in meta["vec_pairs"]}
    assert dropped <= planted  # precision 1.0: no cluster-mate false drops
    assert len(dropped & planted) / len(planted) >= 0.98  # recall on planted


def test_incremental_minhash_at_scale_probes_store_without_shuffle(spark, scale):
    """At 50k docs the corpus/batch cut (0.8·max) puts every planted
    near-dup SOURCE in the store and every COPY in the batch, so the
    incremental probe must recover them at the same s-curve recall as
    the full self-join — and the pair set must be exactly the full
    run's crossing subset."""
    from pyspark.sql import functions as F

    from mcp_server_vector_search_spark.operators.dedup import (
        dedup_incremental_minhash,
    )

    sf_dir, meta = scale
    cut = load_table(spark, sf_dir, "documents").agg(
        F.floor(0.8 * F.max("doc_id")).cast("long")
    ).first()[0]
    rows = dedup_incremental_minhash(spark, sf_dir).collect()
    got = {(r["corpus_doc"], r["new_doc"]) for r in rows}
    assert all(r["jaccard"] >= MINHASH_VERIFY_T for r in rows)
    assert all(c < cut <= n for c, n in got)
    near = {tuple(p) for p in meta["near_pairs"] if p[0] < cut <= p[1]}
    exact = {tuple(p) for p in meta["exact_pairs"] if p[0] < cut <= p[1]}
    assert exact <= got
    recall = len(near & got) / len(near)
    assert recall >= 0.9, f"incremental recall {recall:.3f} below s-curve floor"


def test_hnsw_visited_sublinear_vs_flat_nsw():
    """The round-6 verdict's structure-parity ask: with greedy (ef=1)
    routing on clustered low-dim vectors, the flat NSW walk from its
    fixed entry grows its visited set markedly with node count, while
    the layered descent's growth is logarithmic-ish — AND the layered
    walk routes to the true nearest node at least as reliably.  Pure
    numpy: this measures the navigation structures themselves, not
    Spark."""
    from mcp_server_vector_search_spark.operators.graph_ann import (
        beam_search_stats,
        build_hnsw,
        build_knn_graph,
        hnsw_search_stats,
    )

    rng = np.random.default_rng(7)
    dim, degree, counts = 4, 8, [128, 512, 2048]
    flat_mean, hnsw_mean, flat_hits, hnsw_hits = {}, {}, {}, {}
    for n in counts:
        X = rng.normal(size=(n, dim))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        Xl = X.tolist()
        g = build_knn_graph(Xl, degree=degree)
        h = build_hnsw(Xl, degree=degree)
        fv, hv, fh, hh = [], [], 0, 0
        for _ in range(20):
            q = rng.normal(size=dim)
            q /= np.linalg.norm(q)
            best = int(np.argmax(np.round(X @ q, 6)))
            fp, fc = beam_search_stats(Xl, g, q.tolist(), n_probes=1, beam=1)
            hp, hc = hnsw_search_stats(Xl, h, q.tolist(), n_probes=1, beam=1)
            fv.append(fc)
            hv.append(hc)
            fh += best in fp
            hh += best in hp
        flat_mean[n], hnsw_mean[n] = float(np.mean(fv)), float(np.mean(hv))
        flat_hits[n], hnsw_hits[n] = fh, hh
    lo, hi = counts[0], counts[-1]
    flat_growth = flat_mean[hi] / flat_mean[lo]
    hnsw_growth = hnsw_mean[hi] / hnsw_mean[lo]
    # the hierarchy's expressway: visited-set growth well below flat's
    assert hnsw_growth < 0.8 * flat_growth, (flat_mean, hnsw_mean)
    # and absolutely fewer visits at the largest node count
    assert hnsw_mean[hi] < flat_mean[hi], (flat_mean, hnsw_mean)
    # while routing at least as well
    assert hnsw_hits[hi] >= flat_hits[hi], (flat_hits, hnsw_hits)


def test_streaming_dedup_state_stays_bounded(spark):
    """The 100 TB/day claim behind dropDuplicatesWithinWatermark,
    measured: replay 9 time-ordered micro-batches (200k ids, each
    re-arriving once in the NEXT batch) through a 30s-delay watermark
    dedup and read the state-store size the engine actually reports.
    State must track the delay window (≈ one batch of ids + the 30s
    tail), NOT the corpus — plain dropDuplicates holds every id ever
    seen and fails the bound immediately.  Output must still be
    exactly one row per id."""
    import tempfile

    from mcp_server_vector_search_spark.streaming.ingest import (
        _link_ordered_phases,
    )

    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    N, CHUNKS = 200_000, 8
    PER = N // CHUNKS  # 25k ids per chunk, 1000 ids per event-second
    base = child.range(N).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("id") / 1000).cast("long")).alias("ts"),
    )
    stage = tempfile.mkdtemp(prefix="ddwscale_stage_")
    src = tempfile.mkdtemp(prefix="ddwscale_src_")
    sink = tempfile.mkdtemp(prefix="ddwscale_sink_")
    ckpt = tempfile.mkdtemp(prefix="ddwscale_ckpt_")
    for k in range(CHUNKS + 1):
        fresh = base.where(
            (F.col("id") >= k * PER) & (F.col("id") < (k + 1) * PER)
        )
        dups = base.where(
            (F.col("id") >= (k - 1) * PER) & (F.col("id") < k * PER)
        )
        fresh.unionAll(dups).coalesce(1).write.mode("overwrite").parquet(
            f"{stage}/p{k}"
        )
    _link_ordered_phases(stage, src, [f"p{k}" for k in range(CHUNKS + 1)])
    stream = (
        child.readStream.schema("id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.withWatermark("ts", "30 seconds")
        .dropDuplicatesWithinWatermark(["id"])
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out_n = child.read.parquet(sink).count()
    assert out_n == N, f"each id must be emitted exactly once, got {out_n}"
    state_sizes = [
        op["numRowsTotal"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    ]
    assert state_sizes, "no stateOperators progress recorded"
    # steady-state bound: one 25s chunk of fresh ids (25k) + the 30s
    # delay tail (30k) + purge lag of one batch; corpus-sized state
    # (200k) fails by >2x
    assert max(state_sizes) <= 90_000, (
        f"state not bounded by the delay window: max {max(state_sizes)} rows"
    )
    import shutil

    for d in (stage, src, sink, ckpt):
        shutil.rmtree(d, ignore_errors=True)


def test_fp_atomic_split_eliminates_leaks(spark):
    """The discriminating pair at the correctness SF: the id-keyed
    split strands duplicate chunk content across the train/eval fence
    (the audit row reports real leaks on this corpus — 6 fingerprints
    at sf0.01), while the fingerprint-keyed split reports ZERO via the
    SAME honest left-join probe, because identical content cannot land
    in two splits when the cell is keyed on the fingerprint itself."""
    from mcp_server_vector_search_spark.operators.pipeline import (
        split_fp_atomic,
        split_leakage_check,
    )

    from .conftest import SF_CORRECTNESS

    id_keyed = {
        r.split: r.n_leaked
        for r in split_leakage_check(spark, SF_CORRECTNESS).collect()
    }
    assert sum(id_keyed.values()) > 0, (
        "fixture should exhibit id-keyed leakage for the contrast"
    )
    atomic = split_fp_atomic(spark, SF_CORRECTNESS).collect()
    assert {r.split for r in atomic} == {"train", "val", "test"}
    assert all(r.n_leaked == 0 for r in atomic), atomic
    # and it still partitions everything: chunk totals match the
    # corpus-build fingerprint aggregate
    from mcp_server_vector_search_spark.operators.pipeline import (
        pipeline_build_corpus,
    )
    from pyspark.sql import functions as F

    total = (
        pipeline_build_corpus(spark, SF_CORRECTNESS)
        .agg(F.sum("n_members"))
        .first()[0]
    )
    assert sum(r.n_chunks for r in atomic) == total
