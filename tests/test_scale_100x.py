"""Opt-in 100x stress tier (VERDICT r6 task 9): 500k docs / 200k
vectors — one order of magnitude past the 10x suite, for the three
scale-critical families.  Each test asserts BOTH that quality holds
(planted-pair recall) and that runtime grows ~linearly from the 10x
tier (ratio well under the 10x data growth squared; a quadratic
candidate explosion fails the bound immediately).

Opt in with::

    SPARK_GRAFT_SCALE100=1 python -m pytest tests/test_scale_100x.py -m scale100 -q

The recorded green run lives in STRESS_100X.md.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcp_server_vector_search_spark.sources.tables import load_table

from .scale_corpus import (
    SCALE100_DIR,
    SCALE_DIR,
    build_scale100_corpus,
    build_scale_corpus,
)

pytestmark = [
    pytest.mark.scale100,
    pytest.mark.skipif(
        not os.environ.get("SPARK_GRAFT_SCALE100"),
        reason="100x tier is opt-in: set SPARK_GRAFT_SCALE100=1",
    ),
]

# 10x more data; allow 2.5x constant-factor slack (JVM warmup, shuffle
# rounding, planted-pair growth).  A quadratic stage would come in
# around 100x and fail by a wide margin.
LINEAR_SLACK = 25.0


@pytest.fixture(scope="module")
def tiers():
    meta10 = build_scale_corpus()
    meta100 = build_scale100_corpus()
    return (str(SCALE_DIR), meta10), (str(SCALE100_DIR), meta100)


def test_incremental_minhash_100x(spark, tiers):
    """The store-probe incremental MinHash at 500k docs: planted
    crossing pairs recovered at s-curve recall, exact crossers all
    found, runtime within the linear bound of the 10x run."""
    from mcp_server_vector_search_spark.operators.dedup import (
        MINHASH_VERIFY_T,
        dedup_incremental_minhash,
    )

    (d10, _), (d100, meta100) = tiers
    t0 = time.perf_counter()
    dedup_incremental_minhash(spark, d10).count()
    t10 = time.perf_counter() - t0
    spark.catalog.clearCache()

    cut = (
        load_table(spark, d100, "documents")
        .agg(F.floor(0.8 * F.max("doc_id")).cast("long"))
        .first()[0]
    )
    t0 = time.perf_counter()
    rows = dedup_incremental_minhash(spark, d100).collect()
    t100 = time.perf_counter() - t0
    spark.catalog.clearCache()

    got = {(r["corpus_doc"], r["new_doc"]) for r in rows}
    assert all(r["jaccard"] >= MINHASH_VERIFY_T for r in rows)
    near = {tuple(p) for p in meta100["near_pairs"] if p[0] < cut <= p[1]}
    exact = {tuple(p) for p in meta100["exact_pairs"] if p[0] < cut <= p[1]}
    assert exact <= got
    recall = len(near & got) / len(near)
    assert recall >= 0.9, f"100x incremental recall {recall:.3f}"
    print(
        f"SCALE100 minhash t10={t10:.1f}s t100={t100:.1f}s "
        f"ratio={t100 / t10:.2f} recall={recall:.3f}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"incremental MinHash runtime grew {t100 / t10:.1f}x on 10x data "
        f"({t10:.1f}s -> {t100:.1f}s) — super-linear"
    )


def test_semdedup_100x(spark, tiers):
    """SemDeDup with cells scaled ∝ n (the 100 TB posture: vectors per
    cell ~constant): candidate space stays Σ|cell|² ~linear, planted
    near-identical pairs dropped with precision 1.0, runtime within the
    linear bound."""
    from mcp_server_vector_search_spark.operators.ann import (
        TRAIN_SAMPLE,
        assignment_col,
        train_centroids,
    )
    from mcp_server_vector_search_spark.operators.data_selection import (
        semdedup_dropped,
        semdedup_dropped_gemm,
    )

    def run(sf_dir: str, n_cells: int):
        emb = load_table(spark, sf_dir, "embeddings")
        sample = [
            [float(v) for v in r["embedding"]]
            for r in emb.orderBy("vec_id")
            .limit(TRAIN_SAMPLE)
            .select("embedding")
            .collect()
        ]
        cents = train_centroids(sample, n_cells)
        # production cell counts dispatch to the Arrow GEMM paths —
        # the interpreted-HOF expressions are the fixture/oracle path
        # and are measured pathological beyond ~100 cells
        assigned = emb.withColumn("centroid_id", assignment_col(cents))
        t0 = time.perf_counter()
        dropped = {
            r["vec_id"]
            for r in semdedup_dropped_gemm(assigned, threshold=0.99).collect()
        }
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dropped, dt, assigned

    (d10, meta10), (d100, meta100) = tiers
    drop10, t10, assigned10 = run(d10, 100)
    # GEMM/HOF agreement at the 10x tier: the scale path must select
    # the IDENTICAL drop set the oracle-checked operator selects
    hof10 = {
        r["vec_id"]
        for r in semdedup_dropped(assigned10, threshold=0.99).collect()
    }
    assert drop10 == hof10, "GEMM and HOF SemDeDup disagree at 10x"
    spark.catalog.clearCache()
    dropped, t100, _ = run(d100, 1000)
    planted = {b for _, b in meta100["vec_pairs"]}
    assert dropped <= planted, "cluster-mate false drops at 100x"
    assert len(dropped & planted) / len(planted) >= 0.98
    print(
        f"SCALE100 semdedup t10={t10:.1f}s t100={t100:.1f}s "
        f"ratio={t100 / t10:.2f} recall={len(dropped & planted) / len(planted):.3f}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"SemDeDup runtime grew {t100 / t10:.1f}x on 10x data "
        f"({t10:.1f}s -> {t100:.1f}s) — the cell-scaling bound failed"
    )


def test_ivfpq_100x(spark, tiers):
    """IVF-PQ at 200k vectors: recall@10 >= 0.9 vs exact brute force
    with the rerank pool scaled to ~8% of probed rows, and the
    query-path runtime (pruned ADC scan + re-rank) within the linear
    bound of the 10x tier."""
    from mcp_server_vector_search_spark.operators.ivfpq import (
        ivfpq_topk,
        load_or_build_ivfpq_index,
    )

    def load_vectors(sf_dir):
        rows = (
            load_table(spark, sf_dir, "embeddings")
            .orderBy("vec_id")
            .select("vec_id", "embedding")
            .collect()
        )
        ids = np.asarray([r[0] for r in rows], dtype=np.int64)
        V = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
        return ids, V

    (d10, _), (d100, _) = tiers
    rng = np.random.default_rng(99)

    def run(sf_dir, rerank, n_queries=3):
        index, cents, books = load_or_build_ivfpq_index(spark, sf_dir)
        emb = load_table(spark, sf_dir, "embeddings")
        ids, V = load_vectors(sf_dir)
        norms = np.linalg.norm(V, axis=1)
        recalls, total = [], 0.0
        for _ in range(n_queries):
            j = int(rng.integers(0, len(ids)))
            q = V[j] + rng.normal(scale=0.01, size=V.shape[1])
            sims = (V @ q) / (norms * np.linalg.norm(q))
            true_top = set(ids[np.lexsort((ids, -sims))[:10]].tolist())
            t0 = time.perf_counter()
            got = {
                r["vec_id"]
                for r in ivfpq_topk(
                    index, emb, cents, books, [float(x) for x in q],
                    k=10, rerank=rerank,
                ).collect()
            }
            total += time.perf_counter() - t0
            recalls.append(len(true_top & got) / 10.0)
        return float(np.mean(recalls)), total / n_queries

    _, q10 = run(d10, rerank=1024)
    recall, q100 = run(d100, rerank=10_000)
    assert recall >= 0.9, f"100x IVF-PQ recall@10 {recall:.2f}"
    print(
        f"SCALE100 ivfpq q10={q10:.2f}s q100={q100:.2f}s "
        f"ratio={q100 / q10:.2f} recall={recall:.2f}"
    )
    assert q100 <= LINEAR_SLACK * q10, (
        f"IVF-PQ query runtime grew {q100 / q10:.1f}x on 10x data "
        f"({q10:.1f}s -> {q100:.1f}s) — super-linear"
    )


def test_bm25_100x(spark, tiers):
    """BM25 retrieval at 500k docs: the explode is filtered to the
    query's terms before either aggregate, so cost tracks matching
    postings — runtime must stay inside the linear bound of the 10x
    tier, and the scoring contract (k results, all containing at
    least one query term, descending scores) must hold."""
    from mcp_server_vector_search_spark.operators.text_analysis import bm25_topk

    TERMS = ("w1", "w42", "w100", "the")

    def run(sf_dir):
        d = load_table(spark, sf_dir, "documents")
        t0 = time.perf_counter()
        rows = bm25_topk(d, TERMS).collect()
        dt = time.perf_counter() - t0
        return rows, dt

    rows10, t10 = run(tiers[0][0])
    rows100, t100 = run(tiers[1][0])
    for rows, sf_dir in ((rows10, tiers[0][0]), (rows100, tiers[1][0])):
        assert len(rows) == 10
        scores = [r["bm25"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        top_ids = [r["doc_id"] for r in rows]
        texts = {
            r["doc_id"]: r["text"]
            for r in load_table(spark, sf_dir, "documents")
            .where(F.col("doc_id").isin(top_ids))
            .collect()
        }
        assert all(set(texts[i].split()) & set(TERMS) for i in top_ids)
    print(f"SCALE100 bm25 t10={t10:.2f}s t100={t100:.2f}s ratio={t100 / t10:.2f}")
    assert t100 <= LINEAR_SLACK * t10, (
        f"BM25 runtime grew {t100 / t10:.1f}x on 10x data — super-linear"
    )


def test_lifecycle_churn_100x(spark, tiers):
    """The composed delete→upsert→compaction lifecycle at 200k
    vectors: the query's internal assertion (post-churn top-k EQUAL
    to a from-scratch build) is the quality gate; this test adds the
    scale gate — end-to-end churn runtime within the linear bound of
    the 10x tier (every rewrite touches only affected cells, so cost
    tracks data size, not cell count squared)."""
    from mcp_server_vector_search_spark.operators.lifecycle import (
        q_ann_lifecycle_churn,
    )

    def run(sf_dir):
        t0 = time.perf_counter()
        rows = q_ann_lifecycle_churn(spark, sf_dir).collect()
        return rows, time.perf_counter() - t0

    rows10, t10 = run(tiers[0][0])
    rows100, t100 = run(tiers[1][0])
    assert len(rows10) == 10 and len(rows100) == 10
    print(
        f"SCALE100 lifecycle t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"lifecycle churn grew {t100 / t10:.1f}x on 10x data — super-linear"
    )


def test_export_pipeline_100x(spark, tiers):
    """The composed export job (Gopher gate → exact dedup → per-shard
    packing) at 500k docs: manifest invariants hold (pack token sums
    match doc token sums, dedup removed the planted exact duplicates)
    and runtime stays inside the linear bound of the 10x tier."""
    from mcp_server_vector_search_spark.operators.pipeline import (
        q_pipeline_export_packed,
    )

    def run(sf_dir):
        t0 = time.perf_counter()
        rows = q_pipeline_export_packed(spark, sf_dir).collect()
        return rows, time.perf_counter() - t0

    rows10, t10 = run(tiers[0][0])
    rows100, t100 = run(tiers[1][0])
    for rows, (sf_dir, meta) in ((rows10, tiers[0]), (rows100, tiers[1])):
        assert len(rows) == 20  # one manifest row per source shard
        assert all(r["n_docs"] > 0 and r["n_packs"] > 0 for r in rows)
        assert all(r["total_tokens"] >= r["n_packs"] for r in rows)
    print(
        f"SCALE100 export t10={t10:.2f}s t100={t100:.2f}s ratio={t100 / t10:.2f}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"export pipeline grew {t100 / t10:.1f}x on 10x data — super-linear"
    )


def test_streaming_dedup_bounded_state_100x(spark):
    """The 10x bounded-state streaming certificate
    (tests/test_scale_stress.py::test_streaming_dedup_state_stays_bounded)
    at 2M ids / 4M arrivals: dropDuplicatesWithinWatermark state must
    track the watermark delay window, NOT the corpus, at a volume where
    corpus-sized state (2M rows x 8 state stores) would be the
    difference between a working and a dying executor.  Output exactly
    one row per id; engine-reported max state <= 900k (the 10x test's
    3.6x-per-chunk bound scaled), vs the 2M a plain dropDuplicates
    would hold."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from mcp_server_vector_search_spark.streaming.ingest import (
        _link_ordered_phases,
    )

    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    N, CHUNKS = 2_000_000, 8
    PER = N // CHUNKS
    base = child.range(N).select(
        F.col("id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") / 1000).cast("long")
        ).alias("ts"),
    )
    stage = tempfile.mkdtemp(prefix="ddw100_stage_")
    src = tempfile.mkdtemp(prefix="ddw100_src_")
    sink = tempfile.mkdtemp(prefix="ddw100_sink_")
    ckpt = tempfile.mkdtemp(prefix="ddw100_ckpt_")
    t0 = time.perf_counter()
    for k in range(CHUNKS + 1):
        fresh = base.where((F.col("id") >= k * PER) & (F.col("id") < (k + 1) * PER))
        dups = base.where((F.col("id") >= (k - 1) * PER) & (F.col("id") < k * PER))
        fresh.unionAll(dups).coalesce(1).write.mode("overwrite").parquet(
            f"{stage}/p{k}"
        )
    _link_ordered_phases(stage, src, [f"p{k}" for k in range(CHUNKS + 1)])
    t_stage = time.perf_counter() - t0
    stream = (
        child.readStream.schema("id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t1 = time.perf_counter()
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
    t_stream = time.perf_counter() - t1
    out_n = child.read.parquet(sink).count()
    assert out_n == N, f"each id must be emitted exactly once, got {out_n}"
    state_sizes = [
        op["numRowsTotal"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    ]
    max_state = max(state_sizes)
    print(
        f"SCALE100 streaming-dedup stage={t_stage:.1f}s stream={t_stream:.1f}s "
        f"max_state={max_state} corpus={N}"
    )
    assert max_state <= 900_000, (
        f"state not bounded by the delay window at 100x: {max_state} rows"
    )
    import shutil

    for d in (stage, src, sink, ckpt):
        shutil.rmtree(d, ignore_errors=True)


def test_inverted_conjunctive_100x(spark, tiers):
    """Inverted-index conjunctive (AND) retrieval at 500k docs — the
    boolean-query counterpart of the BM25 row: the token explode's
    grouping-key filter must reach BELOW the posting aggregate (only
    the query terms' postings are built), so cost tracks matching
    postings, not vocabulary.  Correctness is exact: the posting-path
    result set must EQUAL a direct full-scan conjunctive filter, and
    runtime must stay inside the linear bound."""
    TERMS = ("w1", "w7", "the")

    def posting_path(sf_dir):
        d = load_table(spark, sf_dir, "documents")
        t0 = time.perf_counter()
        toks = d.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
        )
        postings = toks.groupBy("tok").agg(
            F.sort_array(F.collect_list("doc_id")).alias("plist"),
            F.count(F.lit(1)).alias("df"),
        )
        hits = postings.where(F.col("tok").isin(*TERMS)).select(
            F.explode("plist").alias("doc_id")
        )
        out = (
            hits.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") == len(TERMS))
        )
        ids = {r["doc_id"] for r in out.collect()}
        return ids, time.perf_counter() - t0

    def scan_truth(sf_dir):
        d = load_table(spark, sf_dir, "documents")
        cond = " AND ".join(
            f"array_contains(split(text, ' '), '{t}')" for t in TERMS
        )
        return {r["doc_id"] for r in d.where(cond).select("doc_id").collect()}

    ids10, t10 = posting_path(tiers[0][0])
    ids100, t100 = posting_path(tiers[1][0])
    assert ids10 == scan_truth(tiers[0][0])
    assert ids100 == scan_truth(tiers[1][0])
    assert len(ids100) > 0, "conjunction must be non-empty at 500k docs"
    print(
        f"SCALE100 inverted-AND t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} hits10={len(ids10)} hits100={len(ids100)}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"conjunctive runtime grew {t100 / t10:.1f}x on 10x data — super-linear"
    )


def test_substring_spans_100x(spark, tiers):
    """Repeated-substring span detection at 500k docs: the planted
    near-dup pairs (a source doc plus one appended token) and exact
    pairs share their ENTIRE text, so both members of every planted
    pair whose shared run is >= the gram width must surface with dup
    spans — a full-recall gate on 2,200/22,000 planted docs.  Runtime
    must stay inside the linear bound: gram construction is window
    leads (codegen), the cross-doc count is one map-side-combined
    shuffle on the gram, and the island merge touches only matched
    spans."""
    from mcp_server_vector_search_spark.operators.dedup import (
        SPAN_K,
        substring_span_stats,
    )

    def run(sf_dir, meta):
        d = load_table(spark, sf_dir, "documents")
        lens = {
            r["doc_id"]: r["n"]
            for r in d.select(
                "doc_id", F.size(F.split("text", " ")).alias("n")
            ).collect()
        }
        t0 = time.perf_counter()
        hit_docs = {
            r["doc_id"] for r in substring_span_stats(d).collect()
        }
        dt = time.perf_counter() - t0
        planted = set()
        for a, b in list(meta["near_pairs"]) + list(meta["exact_pairs"]):
            # a shared run >= SPAN_K tokens guarantees a shared gram
            if min(lens[a], lens[b]) >= SPAN_K:
                planted.update((a, b))
        missed = planted - hit_docs
        assert not missed, f"{len(missed)} planted dup docs missing spans"
        return dt, len(hit_docs), len(planted)

    t10, n10, p10 = run(*tiers[0])
    t100, n100, p100 = run(*tiers[1])
    print(
        f"SCALE100 substring-spans t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} hits={n10}/{n100} planted={p10}/{p100}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"substring spans grew {t100 / t10:.1f}x on 10x data — super-linear"
    )


def test_incremental_semdedup_100x(spark, tiers):
    """The store-probe incremental SemDeDup at 200k vectors: new-batch
    vectors (vec_id ≥ 0.8·max) probe the stored corpus's cells with
    the STORED quantizer; every planted near-identical pair that
    crosses the cut must be recovered (same-cell co-assignment of
    cos≈0.999 twins), inside the linear bound."""
    from mcp_server_vector_search_spark.operators.data_selection import (
        q_dedup_incremental_semdedup,
    )

    (d10, meta10), (d100, meta100) = tiers
    t0 = time.perf_counter()
    q_dedup_incremental_semdedup(spark, d10).count()
    t10 = time.perf_counter() - t0

    cut = (
        load_table(spark, d100, "embeddings")
        .agg(F.floor(0.8 * F.max("vec_id")).cast("long"))
        .first()[0]
    )
    t0 = time.perf_counter()
    rows = q_dedup_incremental_semdedup(spark, d100).collect()
    t100 = time.perf_counter() - t0
    flagged = {r["vec_id"] for r in rows}
    crossing = {b for a, b in meta100["vec_pairs"] if a < cut <= b}
    recall = len(crossing & flagged) / len(crossing)
    print(
        f"SCALE100 incremental-semdedup t10={t10:.1f}s t100={t100:.1f}s "
        f"ratio={t100 / t10:.2f} recall={recall:.3f} "
        f"flagged={len(flagged)} crossing={len(crossing)}"
    )
    assert recall >= 0.95, f"planted crossing-pair recall {recall:.3f}"
    assert t100 <= LINEAR_SLACK * t10, (
        f"incremental SemDeDup grew {t100 / t10:.1f}x on 10x data"
    )


def test_substring_spans_fp_100x(spark, tiers):
    """The fingerprinted span form at 500k docs (r14): the Rabin-Karp
    gram stream must reproduce the exact string-gram statistics
    ROW-FOR-ROW at the full tier (collision-freedom certificate on 24M
    grams) at roughly half the exact form's runtime, inside the linear
    bound."""
    from mcp_server_vector_search_spark.operators.dedup import (
        substring_span_stats,
        substring_span_stats_fp,
    )

    def run(sf_dir):
        d = load_table(spark, sf_dir, "documents")
        t0 = time.perf_counter()
        rows = substring_span_stats_fp(d).collect()
        return {tuple(r) for r in rows}, time.perf_counter() - t0

    fp10, t10 = run(tiers[0][0])
    fp100, t100 = run(tiers[1][0])
    exact100 = {
        tuple(r)
        for r in substring_span_stats(
            load_table(spark, tiers[1][0], "documents")
        ).collect()
    }
    assert fp100 == exact100, (
        f"fingerprint span stats diverged from exact at 100x: "
        f"{len(fp100 ^ exact100)} differing rows"
    )
    print(
        f"SCALE100 substring-spans-fp t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} rows={len(fp10)}/{len(fp100)} exact-equal=True"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"fp spans grew {t100 / t10:.1f}x on 10x data — super-linear"
    )


def test_similarity_join_blocked_100x(spark, tiers):
    """The block-shuffled exact similarity join at the FULL 200k-vector
    tier (VERDICT r13 task 5) — the one operator whose entire reason to
    exist is scale (no driver-side collect of either side).  Gates:
    (a) at 20k vectors the blocked grid's pair set (ids AND rounded
    scores) EQUALS the broadcast-sliced twin's — two physical
    strategies, one answer; (b) at 200k vectors (NB=98 blocks, 9,604
    cogroup dgemm tasks, ~10 GB replicated shuffle) the recovered pair
    set is exactly the 2,000 planted near-identical vector pairs;
    (c) runtime stays far inside the bound even though PAIR work grows
    100x when rows grow 10x."""
    from mcp_server_vector_search_spark.operators.similarity_join import (
        gemm_cosine_pairs,
        gemm_cosine_pairs_shuffled,
    )

    T = 0.9  # above the sigma=0.1 cluster spread, below the planted 0.999

    def run(sf_dir):
        e = load_table(spark, sf_dir, "embeddings")
        t0 = time.perf_counter()
        rows = gemm_cosine_pairs_shuffled(e, T).collect()
        return {(r["a_id"], r["b_id"], r["cos_sim"]) for r in rows}, (
            time.perf_counter() - t0
        )

    blocked10, t10 = run(tiers[0][0])
    bcast10 = {
        (r["a_id"], r["b_id"], r["cos_sim"])
        for r in gemm_cosine_pairs(
            load_table(spark, tiers[0][0], "embeddings"), T
        ).collect()
    }
    assert blocked10 == bcast10, (
        f"blocked vs broadcast diverged at 20k: {len(blocked10 ^ bcast10)} rows"
    )
    blocked100, t100 = run(tiers[1][0])
    planted100 = {tuple(sorted(p)) for p in tiers[1][1]["vec_pairs"]}
    got100 = {(a, b) for a, b, _ in blocked100}
    assert got100 == planted100, (
        f"200k pair set != planted: missing={len(planted100 - got100)} "
        f"extra={len(got100 - planted100)}"
    )
    print(
        f"SCALE100 similarity-join-blocked t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} pairs={len(blocked10)}/{len(blocked100)} "
        f"(pair-work grew 100x)"
    )
    # exact all-pairs WORK is quadratic in rows by definition: 10x rows
    # = 100x dgemm flops, so the bound is work-linear / 2 (the grid must
    # amortize its per-task overhead as blocks fill), not the row-linear
    # LINEAR_SLACK the one-shuffle operators use (measured: 23x on a
    # warm 10x leg, ~10x on a cold one)
    assert t100 <= 50.0 * t10, (
        f"blocked join grew {t100 / t10:.1f}x on 100x pair-work — "
        f"worse than half of work-linear"
    )


def test_hnsw_100x(spark, tiers):
    """Layered HNSW at the 100x tier (VERDICT r10 task 3): the full
    query pipeline — k-means routing nodes (250 at 10x, 1000 at 100x),
    INCREMENTAL layered build (the O(n log n) construction, never the
    n^2 sims matrix), Arrow-GEMM cell assignment, node_id-partitioned
    layout, greedy descent + layer-0 beam picking probe cells, and the
    partition-pruned Spark scan serving exact top-10 inside them.

    The build uses the paper's Algorithm 4 neighbor-selection
    heuristic (select_neighbors_heuristic): on this corpus's 32 tight
    clusters, pure-kNN edges are all intra-cluster, the graph
    fragments into cliques, and the descent cannot cross clusters
    (measured: recall 0.33).  The flat-NSW baseline is the SAME
    layer-0 graph without the hierarchy, so the visited-set comparison
    isolates exactly what the layers buy.

    Gates: (a) recall@10 >= 0.9 vs exact brute force at 200k vectors
    while scanning ~3% of cells; (b) the descent's visited set grows
    SUB-LINEARLY in node count (measured 1.23x visits on 4x nodes —
    4% of nodes touched at 1000 vs 13% at 250) and no worse than the
    flat NSW walk over the same layer-0 graph; the hierarchy-vs-flat
    ASYMPTOTIC contrast lives in the 16x synthetic sweep
    (test_scale_stress.py::test_hnsw_visited_sublinear_vs_flat_nsw) —
    at 4x node growth with a medoid entry both walks are short, so
    here flat parity is a regression guard, not the headline; (c)
    per-query wall time within the linear bound of the 10x tier."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from mcp_server_vector_search_spark.operators.ann import (
        assignment_gemm,
        train_centroids,
    )
    from mcp_server_vector_search_spark.operators.graph_ann import (
        _pruned_node_topk,
        beam_search_stats,
        build_hnsw_incremental,
        hnsw_search,
        hnsw_search_stats,
    )

    rng = np.random.default_rng(1234)

    def run(sf_dir, n_nodes, n_probes, n_queries=3):
        t = pq.read_table(f"{sf_dir}/embeddings.parquet")
        ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        V = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.maximum(np.linalg.norm(V, axis=1), 1e-12)

        nodes = train_centroids(
            [list(v) for v in V[: 8 * n_nodes]], n_nodes
        )
        hnsw = build_hnsw_incremental(nodes, degree=8, heuristic=True)
        # flat NSW = the hierarchy's own layer 0, searched alone
        flat = [hnsw["graphs"][0].get(i, []) for i in range(n_nodes)]

        # (b) greedy visited-set counts on the real trained nodes
        h_vis, f_vis = [], []
        for _ in range(20):
            j = int(rng.integers(0, len(ids)))
            q = V[j] + rng.normal(scale=0.01, size=V.shape[1])
            _, hc = hnsw_search_stats(nodes, hnsw, q.tolist(), 1, 1)
            _, fc = beam_search_stats(nodes, flat, q.tolist(), 1, 1)
            h_vis.append(hc)
            f_vis.append(fc)

        # (a)+(c) the served pipeline: GEMM assign -> partitioned
        # layout -> descent-pruned scan
        emb = load_table(spark, sf_dir, "embeddings")
        layout = tempfile.mkdtemp(prefix="hnsw100x_")
        try:
            emb.withColumn("node_id", assignment_gemm(nodes)).repartition(
                "node_id"
            ).write.mode("overwrite").partitionBy("node_id").parquet(layout)
            index = spark.read.parquet(layout)
            recalls, total = [], 0.0
            for _ in range(n_queries):
                j = int(rng.integers(0, len(ids)))
                q = V[j] + rng.normal(scale=0.01, size=V.shape[1])
                sims = (V @ q) / (norms * np.linalg.norm(q))
                true_top = set(ids[np.lexsort((ids, -sims))[:10]].tolist())
                t0 = time.perf_counter()
                probes = hnsw_search(
                    nodes, hnsw, q.tolist(),
                    n_probes=n_probes, beam=max(2 * n_probes, 16),
                )
                got = {
                    r["vec_id"]
                    for r in _pruned_node_topk(
                        index, probes, [float(x) for x in q], k=10
                    ).collect()
                }
                total += time.perf_counter() - t0
                recalls.append(len(true_top & got) / 10.0)
        finally:
            shutil.rmtree(layout, ignore_errors=True)
        return (
            float(np.mean(recalls)),
            total / n_queries,
            float(np.mean(h_vis)),
            float(np.mean(f_vis)),
        )

    (d10, _), (d100, _) = tiers
    _, q10, h10, f10 = run(d10, n_nodes=250, n_probes=8)
    recall, q100, h100, f100 = run(d100, n_nodes=1000, n_probes=32)

    print(
        f"SCALE100 hnsw q10={q10:.2f}s q100={q100:.2f}s "
        f"ratio={q100 / q10:.2f} recall={recall:.2f} "
        f"visited hnsw {h10:.0f}->{h100:.0f} flat {f10:.0f}->{f100:.0f}"
    )
    assert recall >= 0.9, f"100x HNSW recall@10 {recall:.2f}"
    # visited set sub-linear in node count: 4x nodes, well under 2x visits
    assert (h100 / h10) < 0.5 * (1000 / 250), (h10, h100)
    # and in the same class as the flat walk over the same layer-0
    # graph (regression guard with slack — measured 1.24x vs 1.0x; a
    # broken hierarchy that re-walks layer 0 per level would be >2x)
    assert (h100 / h10) < 1.5 * (f100 / f10), (h10, h100, f10, f100)
    assert q100 <= LINEAR_SLACK * q10, (
        f"HNSW query grew {q100 / q10:.1f}x on 10x data — super-linear"
    )


def test_kmeans_100x(spark, tiers):
    """Distributed Lloyd at 200k vectors: the iterative-family scale
    record.  Gates: (a) the Lloyd objective is monotone non-increasing
    across iterations and actually improves on the clustered corpus
    (>=30% WSS drop vs the init centroids), (b) full-loop runtime grows
    ~linearly from the 10x tier — assignment is map-side O(N*K*D) and
    the update shuffle carries K x (dim+2) longs regardless of N, so a
    super-linear ratio means a broken plan, not a bigger corpus."""
    from mcp_server_vector_search_spark.operators.clustering import kmeans_lloyd

    K = 16

    def wss_at(sf_dir, iters):
        rows = kmeans_lloyd(spark, sf_dir, k=K, iters=iters).collect()
        return sum(r["wss_micro"] for r in rows), sum(r["n_members"] for r in rows)

    def run(sf_dir):
        t0 = time.perf_counter()
        w3, n = wss_at(sf_dir, 3)
        elapsed = time.perf_counter() - t0
        return w3, n, elapsed

    (d10, m10), (d100, m100) = tiers

    # quality ladder at the 100x tier: monotone + real improvement
    w0, n0 = wss_at(d100, 0)
    w1, _ = wss_at(d100, 1)
    w2, _ = wss_at(d100, 2)
    w3, n3, t100 = run(d100)
    assert n0 == n3  # mass conservation at every iteration depth
    slop = 1.000001
    assert w1 <= w0 * slop and w2 <= w1 * slop and w3 <= w2 * slop, (
        w0, w1, w2, w3,
    )
    assert w3 < 0.7 * w0, f"Lloyd failed to improve: {w3 / w0:.2f} of init WSS"

    _, _, t10 = run(d10)
    print(
        f"SCALE100 kmeans t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} wss3/wss0={w3 / w0:.3f}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"k-means loop grew {t100 / t10:.1f}x on 10x data — super-linear"
    )


def test_power_iteration_100x(spark, tiers):
    """Distributed power iteration at 200k vectors: per-iteration cost
    is one scan + a 64-long single-row reduce, so the loop must track
    data size ~linearly; quality gate = the final direction captures
    measurably more Rayleigh mass per unit length than the raw axis
    start.  NOTE the bound is modest by construction: this corpus is
    320 random unit centers in 64-dim, which is NEARLY ISOTROPIC (the
    spectrum is flat), so the true top component only beats a raw axis
    by ~1.4x here — the gate pins improvement, not dominance (the
    sf-testdata fixture, measured 1.57x against its tighter 1.5x gate,
    is covered in tests/test_linalg.py)."""
    from mcp_server_vector_search_spark.operators.linalg import (
        _row_dot_micro,
        power_iteration_top_component,
    )

    def rayleigh_under(sf_dir, v):
        pts = load_table(spark, sf_dir, "embeddings").select(
            F.col("embedding").cast("array<double>").alias("emb")
        )
        e = F.col("su").cast("double") / F.lit(1000000000.0)
        return (
            pts.select(_row_dot_micro(v).alias("su"))
            .groupBy()
            .agg(F.sum(F.floor((e * e) * F.lit(1000000000.0))).alias("r"))
            .collect()[0]["r"]
        )

    def run(sf_dir):
        t0 = time.perf_counter()
        row = power_iteration_top_component(spark, sf_dir).collect()[0]
        return row, time.perf_counter() - t0

    (d10, _), (d100, _) = tiers
    _, t10 = run(d10)
    row, t100 = run(d100)

    comp = [c / 1e9 for c in row["component_micro"]]
    norm_sq = sum(c * c for c in comp)
    r_axis = rayleigh_under(d100, [1.0] + [0.0] * 63)
    print(
        f"SCALE100 power-iter t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} gain={row['rayleigh_micro'] / norm_sq / max(r_axis, 1):.1f}x"
    )
    assert row["rayleigh_micro"] / norm_sq > r_axis * 1.15
    assert row["n_rows"] == 200_000
    assert t100 <= LINEAR_SLACK * t10, (
        f"power iteration grew {t100 / t10:.1f}x on 10x data — super-linear"
    )


def test_interval_overlap_100x(spark):
    """Bucketed interval overlap join at 200k synthetic windows (no
    equi-key).  Gates: (a) planted full-span windows report EXACTLY
    N+K-1 overlaps each (they intersect everything), (b) bucketed
    counts equal the naive theta-join at the 10x tier, (c) runtime
    grows ~linearly from 20k -> 200k windows — the naive join is
    O(N^2) and would blow the bound by an order of magnitude.

    Windows are deterministic arithmetic (no RNG): starts stride a
    30-day span by a prime, durations cycle 60..600 s, so expected
    per-bucket concurrency is ~25 at 200k and pair work is
    Sigma concurrency^2, not N^2.
    """
    from mcp_server_vector_search_spark.operators.temporal import (
        count_interval_overlaps,
    )

    SPAN = 30 * 86_400
    PLANTED = 5

    def windows(n):
        base = spark.range(n).select(
            F.col("id").alias("win_id"),
            ((F.col("id") * 7919) % SPAN).alias("s"),
        )
        base = base.select(
            "win_id", "s", (F.col("s") + 60 + (F.col("win_id") % 541)).alias("e")
        )
        planted = spark.range(PLANTED).select(
            (F.col("id") + n).alias("win_id"),
            F.lit(0).cast("long").alias("s"),
            F.lit(SPAN + 86_400).cast("long").alias("e"),
        )
        return base.unionByName(planted)

    def run(n):
        w = windows(n)
        t0 = time.perf_counter()
        rows = count_interval_overlaps(w).collect()
        return {r["win_id"]: r["n_concurrent"] for r in rows}, (
            time.perf_counter() - t0
        )

    n10, n100 = 20_000, 200_000
    got10, t10 = run(n10)
    got100, t100 = run(n100)

    # (a) planted full-span windows see everything
    for n, got in ((n10, got10), (n100, got100)):
        for pid in range(n, n + PLANTED):
            assert got[pid] == n + PLANTED - 1, (pid, got[pid])

    # (b) bucketed == naive at the 10x tier
    w = windows(n10)
    a, b = w.alias("a"), w.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e"))
            & (F.col("a.win_id") != F.col("b.win_id")),
        )
        .groupBy(F.col("a.win_id").alias("win_id"))
        .agg(F.count(F.lit(1)).alias("n_concurrent"))
    )
    want10 = {r["win_id"]: r["n_concurrent"] for r in naive.collect()}
    assert got10 == want10

    print(
        f"SCALE100 interval_overlap t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} pairs100={sum(got100.values())}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"interval overlap grew {t100 / t10:.1f}x on 10x windows — super-linear"
    )


def test_components_star_100x(spark):
    """Distributed large-star/small-star connected components on the
    adversarial shape: path graphs, where naive min-propagation needs
    O(path length) rounds but the star alternation needs O(log L).
    Tiers: 128k -> 1.28M nodes in 1024-node paths (edge count ~= node
    count).  Gates: EVERY node's label equals its path's minimum id at
    both tiers (exact, planted by construction), and 10x the edges
    costs at most LINEAR_SLACK x the time — rounds are log-bounded by
    the FIXED path length, so the loop must scale with edge volume
    only."""
    from mcp_server_vector_search_spark.operators.components import (
        connected_components,
    )

    L = 1024

    def run(n_nodes):
        edges = (
            spark.range(n_nodes)
            .where((F.col("id") % L) != L - 1)
            .select(F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id"))
        )
        t0 = time.perf_counter()
        labels = connected_components(edges, driver_max_edges=0)
        bad = labels.where(
            F.col("comp") != (F.col("node") - F.col("node") % L)
        ).count()
        n_labeled = labels.count()
        dt = time.perf_counter() - t0
        return bad, n_labeled, dt

    n10, n100 = 131_072, 1_310_720
    bad10, lab10, t10 = run(n10)
    bad100, lab100, t100 = run(n100)

    assert bad10 == 0 and lab10 == n10, (bad10, lab10)
    assert bad100 == 0 and lab100 == n100, (bad100, lab100)

    print(
        f"SCALE100 components_star t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} nodes100={lab100}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"star CC grew {t100 / t10:.1f}x on 10x edges — super-linear"
    )


def test_bpe_encode_100x(spark, tiers):
    """BPE tokenize at corpus scale: train 8 merges + encode the vocab
    + broadcast-join token counts onto 50k -> 500k docs.  The claim
    under test is the production cost split — encode work is O(vocab),
    only the word-keyed join and the per-doc agg touch the corpus — so
    10x the documents must cost ~linear time even though the encode
    chain itself is unchanged.  Correctness at scale: 200 sampled vocab
    words at the 100x tier must tokenize EXACTLY like the classic
    rank-ordered merge loop run in python on the tier's own merges."""
    from mcp_server_vector_search_spark import registry
    from mcp_server_vector_search_spark.operators.text_analysis import (
        _bpe_encode_expr,
        _bpe_merges_for,
    )

    registry.load_all_operators()
    (dir10, _m10), (dir100, _m100) = tiers

    def run(sf_dir):
        t0 = time.perf_counter()
        rows = registry.QUERIES["tokenizer_bpe_encode"](spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        return rows, dt

    rows10, t10 = run(dir10)
    rows100, t100 = run(dir100)

    for rows, n_min in ((rows10, 49_000), (rows100, 490_000)):
        assert len(rows) >= n_min, len(rows)
        assert all(r["n_tokens"] >= r["n_words"] for r in rows)

    # classic-merge equality on sampled vocabulary at the 100x tier
    merges = _bpe_merges_for(spark, dir100)
    toks = F.filter(F.split(_bpe_encode_expr(merges), " "), lambda s: s != F.lit(""))
    sample = (
        load_table(spark, dir100, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .distinct()
        .orderBy(F.xxhash64("word"))
        .limit(200)
        .select("word", toks.alias("t"))
        .collect()
    )

    from mcp_server_vector_search_spark.operators.text_analysis import (
        bpe_apply_merges,
    )

    bad = [(r["word"], r["t"], bpe_apply_merges(r["word"], merges))
           for r in sample if r["t"] != bpe_apply_merges(r["word"], merges)]
    assert not bad, bad[:3]

    print(
        f"SCALE100 bpe_encode t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} docs100={len(rows100)}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"bpe encode grew {t100 / t10:.1f}x on 10x docs — super-linear"
    )


def test_line_dedup_100x(spark, tiers):
    """Line-level dedup at 500k docs with a planted-recall gate: every
    planted EXACT duplicate doc must have 100% of its lines flagged at
    min_docs=2 (its twin contributes every line), and runtime stays
    inside the linear bound of the 10x tier."""
    from mcp_server_vector_search_spark.operators.dedup import (
        line_dedup_stats,
    )

    def run(sf_dir):
        t0 = time.perf_counter()
        rows = line_dedup_stats(
            load_table(spark, sf_dir, "documents"), min_docs=2
        ).collect()
        return rows, time.perf_counter() - t0

    rows10, t10 = run(tiers[0][0])
    rows100, t100 = run(tiers[1][0])
    for rows, (sf_dir, meta) in ((rows10, tiers[0]), (rows100, tiers[1])):
        stats = {r["doc_id"]: r for r in rows}
        planted = {b for _, b in meta["exact_pairs"]} | {
            a for a, _ in meta["exact_pairs"]
        }
        missed = [
            d
            for d in planted
            if stats[d]["n_dup_lines"] != stats[d]["n_lines"]
        ]
        assert not missed, (
            f"{len(missed)} planted exact-dup docs with unflagged lines"
        )
        # flagged lines drop tokens: planted docs keep zero tokens
        assert all(stats[d]["n_kept_tokens"] == 0 for d in planted)
    print(
        f"SCALE100 line-dedup t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} planted={len({b for _, b in tiers[1][1]['exact_pairs']})}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"line dedup grew {t100 / t10:.1f}x on 10x data — super-linear"
    )


def test_triangles_100x(spark, tiers):
    """The degree-ordered triangle census at 500k docs / ~1.5M edges:
    the orientation's whole claim is that WEDGE count (the join's
    work) grows ~linearly with the graph even though the hubs' raw
    in-degrees grow 10x — an id-oriented naive form would enumerate
    (n/97)² wedges per hub, a 100x blow-up per tier step.  Gates:
    wedge growth inside the linear bound, runtime inside the linear
    bound, and bit-determinism across runs."""
    from mcp_server_vector_search_spark.operators.components import (
        q_graph_triangle_count,
    )

    def run(sf_dir):
        t0 = time.perf_counter()
        row = q_graph_triangle_count(spark, sf_dir).collect()[0]
        return row, time.perf_counter() - t0

    r10, t10 = run(tiers[0][0])
    r100, t100 = run(tiers[1][0])
    r100b, _ = run(tiers[1][0])
    assert tuple(r100b) == tuple(r100), "triangle census must be deterministic"
    wedge_ratio = r100["n_wedges"] / max(r10["n_wedges"], 1)
    print(
        f"SCALE100 triangles t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} tri={r10['n_triangles']}/{r100['n_triangles']} "
        f"wedges={r10['n_wedges']}/{r100['n_wedges']} "
        f"wedge_ratio={wedge_ratio:.1f}"
    )
    assert wedge_ratio <= LINEAR_SLACK, (
        f"wedge count grew {wedge_ratio:.0f}x on 10x edges — the "
        f"orientation is not bounding the hub fan-out"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"triangle census grew {t100 / t10:.1f}x on 10x data"
    )


def test_pagerank_100x(spark, tiers):
    """Exact-integer PageRank at 500k docs / 1.5M edges: the hub
    structure must dominate (every top-20 node is one of the 97 hubs),
    the computation is bit-deterministic (two runs, identical rows),
    and runtime stays inside the linear bound of the 10x tier."""
    from mcp_server_vector_search_spark.operators.components import (
        PAGERANK_HUBS,
        q_graph_pagerank_integer,
    )

    def run(sf_dir):
        t0 = time.perf_counter()
        rows = q_graph_pagerank_integer(spark, sf_dir).collect()
        return rows, time.perf_counter() - t0

    rows10, t10 = run(tiers[0][0])
    rows100, t100 = run(tiers[1][0])
    for rows in (rows10, rows100):
        assert len(rows) == 20
        assert all(r["doc_id"] < PAGERANK_HUBS for r in rows), (
            "a non-hub node outranked the hubs"
        )
        ranks = [r["rank_scaled"] for r in rows]
        assert ranks == sorted(ranks, reverse=True)
    rows100b, _ = run(tiers[1][0])
    assert [tuple(r) for r in rows100b] == [tuple(r) for r in rows100], (
        "integer PageRank must be bit-deterministic across runs"
    )
    print(
        f"SCALE100 pagerank t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"pagerank grew {t100 / t10:.1f}x on 10x data — super-linear"
    )


def test_kcore_100x(spark, tiers):
    """K-core peel at 500k docs / ~1.5M varied-degree edges: the
    bounded synchronized peel must still CONVERGE (the output-embedded
    certificate: min core degree >= K), the core must be non-vacuous,
    and runtime stays inside the linear bound.  The removal cascade at
    this scale is front-loaded (125k + 62k nodes in two rounds —
    measured at design time with DuckDB), so the early-exit saves the
    four no-op rounds."""
    from mcp_server_vector_search_spark.operators.components import (
        KCORE_K,
        q_graph_kcore_membership,
    )

    def run(sf_dir):
        t0 = time.perf_counter()
        rows = q_graph_kcore_membership(spark, sf_dir).collect()
        return rows, time.perf_counter() - t0

    rows10, t10 = run(tiers[0][0])
    rows100, t100 = run(tiers[1][0])
    for rows, n_docs in ((rows10, 50_000), (rows100, 500_000)):
        mind = min(r["core_degree"] for r in rows)
        assert mind >= KCORE_K, f"peel did not converge: min degree {mind}"
        assert 0 < len(rows) < n_docs, "vacuous core"
    print(
        f"SCALE100 kcore t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} core10={len(rows10)} core100={len(rows100)}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"k-core peel grew {t100 / t10:.1f}x on 10x data"
    )


def test_blocklist_multiscan_100x(spark, tiers):
    """Aho-Corasick one-pass scan at 500k docs: a tier-vocabulary
    pattern list (words, a phrase, and sub-word fragments that cross
    token boundaries), counts spot-checked against the brute-force
    all-occurrences reference on a 200-doc sample, runtime inside the
    linear bound."""
    from mcp_server_vector_search_spark.operators.curation import (
        blocklist_scan,
    )

    patterns = (
        ("w17 t", "block"),  # phrase fragment crossing a token boundary
        ("w23 the", "block"),
        ("w111", "flag"),
        ("w42", "flag"),
        ("0 w", "probe"),  # digit-boundary fragment
        ("9 the", "probe"),
    )

    def run(sf_dir):
        t0 = time.perf_counter()
        rows = blocklist_scan(
            load_table(spark, sf_dir, "documents"), patterns
        ).collect()
        return rows, time.perf_counter() - t0

    rows10, t10 = run(tiers[0][0])
    rows100, t100 = run(tiers[1][0])
    assert rows100, "no matches at the tier — vacuous pattern list"

    # brute-force spot check on a deterministic 200-doc sample
    def brute(text):
        total = 0
        hit = 0
        for p, _ in patterns:
            c, i = 0, text.find(p)
            while i != -1:
                c += 1
                i = text.find(p, i + 1)
            total += c
            hit += 1 if c else 0
        return total, hit

    got = {r["doc_id"]: (r["n_matches"], r["n_patterns_hit"]) for r in rows100}
    sample = (
        load_table(spark, tiers[1][0], "documents")
        .where((F.col("doc_id") % 2500) == 0)
        .select("doc_id", "text")
        .collect()
    )
    assert len(sample) >= 150
    for r in sample:
        total, hit = brute(r["text"])
        want = (total, hit) if total else None
        assert got.get(r["doc_id"]) == want, (
            f"doc {r['doc_id']}: scan {got.get(r['doc_id'])} != brute {want}"
        )
    print(
        f"SCALE100 blocklist t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} matched10={len(rows10)} matched100={len(rows100)}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"blocklist scan grew {t100 / t10:.1f}x on 10x docs"
    )


def test_knn_graph_100x(spark, tiers):
    """Exact kNN graph at the 200k-vector tier: like the blocked
    similarity join, pair WORK grows 100x when rows grow 10x (the grid
    runs 49² cogroup dgemm tasks at block_rows=4096), so the bound is
    work-linear / 2.  Quality gates: every vector gets exactly k
    neighbors, and each of the 2,000 planted near-identical pairs
    (cos ≈ 0.999, above the σ=0.1 cluster spread) appears in BOTH
    members' neighbor lists — checked distributed via a join, never by
    collecting the 1M-row graph."""
    from mcp_server_vector_search_spark.operators.similarity_join import (
        knn_graph_blocked,
    )

    def run(sf_dir, meta, n_vec):
        e = load_table(spark, sf_dir, "embeddings")
        t0 = time.perf_counter()
        g = knn_graph_blocked(e, k=5, block_rows=4096).localCheckpoint()
        n_rows = g.count()
        t = time.perf_counter() - t0
        assert n_rows == n_vec * 5, f"{n_rows} != {n_vec}*5"
        pairs = {tuple(sorted(p)) for p in meta["vec_pairs"]}
        both = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        pdf = spark.createDataFrame(both, "a_id long, nbr_id long")
        hit = g.join(pdf, ["a_id", "nbr_id"]).count()
        return hit, 2 * len(pairs), t

    hit10, want10, t10 = run(tiers[0][0], tiers[0][1], 20_000)
    hit100, want100, t100 = run(tiers[1][0], tiers[1][1], 200_000)
    assert hit10 == want10, f"10x: planted partner in top-5 {hit10}/{want10}"
    assert hit100 == want100, f"100x: planted partner in top-5 {hit100}/{want100}"
    print(
        f"SCALE100 knn-graph t10={t10:.2f}s t100={t100:.2f}s "
        f"ratio={t100 / t10:.2f} (pair-work grew 100x)"
    )
    assert t100 <= 50.0 * t10, (
        f"knn graph grew {t100 / t10:.1f}x on 100x pair-work"
    )


def test_minhash_weighted_100x(spark, tiers):
    """Weighted-Jaccard MinHash at 500k docs: the tf-expansion must
    stay row-local (runtime inside the linear bound), the integer
    verify must hold on every emitted pair (10·Σmin ≥ 9·Σmax by
    construction of the output), all 100 planted exact duplicates pass
    (weighted J = 1), and the 1,000 copy+one-token near pairs
    (weighted J ≈ 60/61) land at s-curve recall."""
    from mcp_server_vector_search_spark.operators.dedup import (
        WJ_T_DEN,
        WJ_T_NUM,
        dedup_minhash_weighted,
    )

    def run(sf_dir, meta):
        t0 = time.perf_counter()
        rows = dedup_minhash_weighted(spark, sf_dir).collect()
        t = time.perf_counter() - t0
        got = {(r["a_id"], r["b_id"]) for r in rows}
        assert all(
            WJ_T_DEN * r["sum_min"] >= WJ_T_NUM * r["sum_max"] for r in rows
        )
        exact = {tuple(sorted(p)) for p in meta["exact_pairs"]}
        near = {tuple(sorted(p)) for p in meta["near_pairs"]}
        assert exact <= got, f"missed {len(exact - got)} exact dups"
        return len(near & got) / len(near), t

    rec10, t10 = run(*tiers[0])
    rec100, t100 = run(*tiers[1])
    assert rec10 >= 0.9 and rec100 >= 0.9, (rec10, rec100)
    print(
        f"SCALE100 minhash-weighted t10={t10:.1f}s t100={t100:.1f}s "
        f"ratio={t100 / t10:.2f} recall10={rec10:.3f} recall100={rec100:.3f}"
    )
    assert t100 <= LINEAR_SLACK * t10, (
        f"weighted MinHash grew {t100 / t10:.1f}x on 10x docs"
    )
