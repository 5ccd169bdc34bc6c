"""Semantic invariants of the dedup family (beyond oracle parity):
LSH recall against the exact pair set, signature properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_server_vector_search_spark.operators import dedup
from mcp_server_vector_search_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS


def exact_jaccard_pairs(spark, sf_dir, threshold):
    """Ground truth: ALL token-set Jaccard pairs >= threshold (no LSH)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    counts = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ca = counts.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(ca, "a_id").join(cb, "b_id")
        .where(jac >= threshold)
        .select("a_id", "b_id")
    )


def test_minhash_lsh_recall_and_precision(spark):
    truth = {
        (r.a_id, r.b_id)
        for r in exact_jaccard_pairs(spark, SF_CORRECTNESS, dedup.MINHASH_VERIFY_T).collect()
    }
    found = {
        (r.a_id, r.b_id)
        for r in dedup.dedup_minhash_lsh(spark, SF_CORRECTNESS).collect()
    }
    assert found, "LSH found no near-dup pairs on a corpus known to have them"
    # precision is 1.0 by construction (exact verify step)
    assert found <= truth
    # recall bounded by the s-curve 1-(1-j^8)^2 >= 0.57 at j=0.9; corpus
    # pairs are mostly j≈1.0 where recall ≈ 1, so demand a healthy floor
    recall = len(found) / len(truth)
    assert recall >= 0.5, f"LSH recall {recall:.2f} below floor"


def test_simhash_identical_bags_collide(spark):
    """Docs with identical token sets must get identical SimHash."""
    d = load_table(spark, SF_CORRECTNESS, "documents")
    sigs = dedup.simhash_signatures(d)
    bags = d.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
        ).alias("bag"),
    )
    joined = sigs.join(bags, "doc_id")
    n_distinct = (
        joined.groupBy("bag")
        .agg(F.countDistinct("simhash").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert n_distinct == 0


def test_minhash_estimate_tracks_jaccard(spark):
    """est_jaccard from signatures should approximate verified jaccard."""
    rows = dedup.dedup_minhash_lsh(spark, SF_CORRECTNESS).collect()
    assert rows
    mae = sum(abs(r.est_jaccard - r.jaccard) for r in rows) / len(rows)
    assert mae < 0.2, f"MinHash estimate MAE {mae:.3f} too high for k=16"


def test_embedding_lsh_recall_vs_exact(spark):
    """The SRP-bucketed semantic dedup must recover most of the exact
    GEMM pair set (sub-quadratic candidates, same verify threshold)."""
    exact = {
        (r.a_id, r.b_id)
        for r in dedup.dedup_embedding_cosine_exact(spark, SF_CORRECTNESS).collect()
    }
    approx = {
        (r.a_id, r.b_id)
        for r in dedup.dedup_embedding_lsh(spark, SF_CORRECTNESS).collect()
    }
    assert exact, "exact pair set empty — fixture changed?"
    assert approx <= exact  # verify stage guarantees no false positives
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"embedding-LSH recall {recall:.2f}"


def test_embedding_cosine_kernel_matches_hof_verify(spark):
    """The two verify kernels over the same SRP candidates — numpy batch
    kernel (dedup_embedding_cosine) and HOF cosine (dedup_embedding_lsh)
    — must produce the identical rounded pair set."""
    a = {
        (r.a_id, r.b_id, r.cos_sim)
        for r in dedup.dedup_embedding_cosine(spark, SF_CORRECTNESS).collect()
    }
    b = {
        (r.a_id, r.b_id, r.cos_sim)
        for r in dedup.dedup_embedding_lsh(spark, SF_CORRECTNESS).collect()
    }
    assert a == b and a


def test_salted_bucket_join_skew_correct_and_spread(spark):
    """Hot-bucket hardening (VERDICT r4 #6): a corpus where EVERY doc is
    a near-identical copy puts all band buckets on one key — the
    worst-case skew.  The salted self-join must still produce exactly
    the all-pairs result, and the join's shuffle must partition on the
    salt cells (band, key, cell, pair) so the bucket spreads over
    cell-pair tasks instead of one straggler reducer."""
    from mcp_server_vector_search_spark.operators.dedup import (
        LSH_SALTS,
        lsh_candidate_pairs,
        minhash_signatures,
        salted_bucket_pairs,
    )
    from mcp_server_vector_search_spark.plans.explain import formatted_plan

    n = 60
    docs = spark.createDataFrame(
        [(i, "the same viral document text repeated everywhere") for i in range(n)],
        "doc_id long, text string",
    )
    cand = lsh_candidate_pairs(minhash_signatures(docs))
    pairs = {(r["a_id"], r["b_id"]) for r in cand.collect()}
    assert pairs == {(a, b) for a in range(n) for b in range(n) if a < b}

    plan = formatted_plan(cand)
    # the bucket join's exchange must include the salt columns — that IS
    # the spread (a plain (band, key) partitioning would put the whole
    # bucket on one task)
    assert "__cell" in plan and "__pair" in plan

    # per-task bound: with S cells no (cell, pair) reduce group sees more
    # than ceil(n/S)^2 candidate comparisons
    one_bucket = minhash_signatures(docs).withColumn("band", F.lit(0)).withColumn(
        "key", F.lit("k")
    )
    rows = (
        salted_bucket_pairs(one_bucket, ["band", "key"])
        .groupBy(
            F.col("a.__cell").alias("ca"), F.col("b.__cell").alias("cb")
        )
        .count()
        .collect()
    )
    sizes = {
        r["__cell"]: r["count"]
        for r in one_bucket.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(LSH_SALTS)).cast("int").alias("__cell")
        )
        .groupBy("__cell")
        .count()
        .collect()
    }
    assert rows
    for r in rows:
        bi, bj = sizes[r["ca"]], sizes[r["cb"]]
        bound = bi * (bi - 1) if r["ca"] == r["cb"] else bi * bj
        assert r["count"] <= bound
        # and every cell-pair task is far below the unsalted single-task
        # pair mass n(n-1)/2
        assert r["count"] < n * (n - 1) // 2


def test_prefix_filter_equals_full_join(spark):
    """The PPJoin theorem in practice: prefix-filtered candidates +
    exact verify must produce the IDENTICAL pair set as the full
    shingle join."""
    from mcp_server_vector_search_spark.operators.dedup import (
        dedup_jaccard_prefix_filter,
        dedup_ngram_jaccard,
    )

    from .conftest import SF_CORRECTNESS

    full = {tuple(r) for r in dedup_ngram_jaccard(spark, SF_CORRECTNESS).collect()}
    fast = {
        tuple(r)
        for r in dedup_jaccard_prefix_filter(spark, SF_CORRECTNESS).collect()
    }
    assert fast == full and full


def test_incremental_minhash_equals_full_restricted(spark):
    """The batch-vs-store probe must find exactly the full self-join's
    pairs that cross the corpus/batch cut — incrementality cannot
    change which near-duplicates exist."""
    from pyspark.sql import functions as F

    from mcp_server_vector_search_spark.operators.dedup import (
        dedup_incremental_minhash,
        dedup_minhash_lsh,
    )
    from mcp_server_vector_search_spark.sources.tables import load_table

    sf = SF_CORRECTNESS
    cut = load_table(spark, sf, "documents").agg(
        F.floor(0.8 * F.max("doc_id")).cast("long")
    ).first()[0]
    full = {
        (r["a_id"], r["b_id"], r["est_jaccard"], r["jaccard"])
        for r in dedup_minhash_lsh(spark, sf).collect()
        if r["a_id"] < cut <= r["b_id"]
    }
    inc = {
        (r["corpus_doc"], r["new_doc"], r["est_jaccard"], r["jaccard"])
        for r in dedup_incremental_minhash(spark, sf).collect()
    }
    assert inc == full
    assert inc  # non-trivial at the correctness SF


def test_substring_spans_known_plant(spark):
    """A planted 8-token span shared by two docs must surface with the
    exact merged-region accounting: doc A repeats a 10-token window of
    doc B -> both docs report one region; A's covers 10 tokens (three
    overlapping 8-gram hits merged), and an unrelated doc reports
    nothing."""
    from mcp_server_vector_search_spark.operators.dedup import (
        substring_span_stats,
    )

    shared = " ".join(f"s{i}" for i in range(10))  # 10 shared tokens
    rows = [
        (1, f"a1 a2 {shared} a3"),
        (2, f"b1 {shared} b2 b3 b4"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["n_regions"], r["covered_tokens"])
        for r in substring_span_stats(docs).collect()
    }
    # 10-token shared run -> 3 overlapping 8-gram spans, one region of 10
    assert got == {1: (3, 1, 10), 2: (3, 1, 10)}


def test_substring_spans_fp_matches_exact_and_handles_edges(spark):
    """The fingerprint form must reproduce the exact form row-for-row on
    the planted fixture, and the map-side generator must survive the
    edge shapes the exact form's explode handles implicitly: NULL text,
    empty text, docs shorter than the gram width, and a doc that is
    EXACTLY one gram long (boundary of the rolling window)."""
    from mcp_server_vector_search_spark.operators.dedup import (
        SPAN_K,
        doc_gram_fingerprints,
        substring_span_stats,
        substring_span_stats_fp,
    )

    shared = " ".join(f"s{i}" for i in range(10))
    exact_gram = " ".join(f"e{i}" for i in range(SPAN_K))
    rows = [
        (1, f"a1 a2 {shared} a3"),
        (2, f"b1 {shared} b2 b3 b4"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
        (4, None),
        (5, ""),
        (6, "short doc"),
        (7, exact_gram),  # exactly one gram
        (8, exact_gram),  # duplicated single-gram doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {tuple(r) for r in substring_span_stats(docs).collect()}
    b = {tuple(r) for r in substring_span_stats_fp(docs).collect()}
    assert a == b
    got = {r["doc_id"]: tuple(r)[1:] for r in substring_span_stats_fp(docs).collect()}
    assert got[7] == (1, 1, SPAN_K) and got[8] == (1, 1, SPAN_K)
    # generator-level edges: doc 4 (NULL) and 5 ('') yield no grams but
    # must not error; doc 7 yields exactly one gram at s=1
    g = {
        (r["doc_id"], r["s"]) for r in doc_gram_fingerprints(docs).collect()
    }
    assert (7, 1) in g and not any(d in (4, 5, 6) for d, _ in g)


def test_scurve_tracks_theory(spark):
    """The measured band-collision rate per exact-Jaccard bin must
    track the closed-form S-curve at the deployed (b, r): near-zero
    below the knee, within binomial noise around it, exactly 1.0 at
    the equality bin (identical sets give identical signatures by
    construction, so anything else is a signature bug)."""
    rows = {
        r["bin"]: r
        for r in dedup.q_dedup_lsh_scurve_certificate(
            spark, SF_CORRECTNESS
        ).collect()
    }
    assert rows, "no bins produced"
    # equality bin: deterministic, not statistical
    assert rows[10]["n_collide"] == rows[10]["n_pairs"]
    # below the knee the curve is ~0: allow a stray collision per bin
    for b in range(0, 5):
        if b in rows:
            r = rows[b]
            assert r["n_collide"] <= max(1, 0.1 * r["n_pairs"]), (
                f"bin {b}: {r['n_collide']}/{r['n_pairs']} collides — "
                f"far above theory {r['theory_p6']}"
            )
    # around/above the knee the rate must be clearly nonzero and the
    # empirical rate must not fall 4x under theory (binomial slack on
    # tens of pairs)
    for b in (7, 8):
        if b in rows:
            r = rows[b]
            rate = r["n_collide"] / r["n_pairs"]
            assert rate >= r["theory_p6"] / 4, (
                f"bin {b}: rate {rate:.3f} vs theory {r['theory_p6']}"
            )
    # monotone trend: pooled rate above bin 6 exceeds pooled rate below bin 5
    hi = [rows[b] for b in rows if b >= 7]
    lo = [rows[b] for b in rows if b <= 4]
    hi_rate = sum(r["n_collide"] for r in hi) / max(1, sum(r["n_pairs"] for r in hi))
    lo_rate = sum(r["n_collide"] for r in lo) / max(1, sum(r["n_pairs"] for r in lo))
    assert hi_rate > lo_rate + 0.2


def test_scurve_theory_literal_matches_closed_form():
    """The registration-time literal IS the closed form at the bin
    midpoints (bin 10 pinned at s=1) under the shared round6."""
    from mcp_server_vector_search_spark.functions.train import round6
    from mcp_server_vector_search_spark.operators.dedup import (
        BAND_ROWS,
        N_BANDS,
        _scurve_theory_rows,
    )

    for b, p in _scurve_theory_rows():
        s = 1.0 if b == 10 else (b + 0.5) / 10.0
        assert p == round6(1.0 - (1.0 - s**BAND_ROWS) ** N_BANDS)


def test_weighted_expansion_distinguishes_multiplicity(spark):
    """The tf-replication must (a) expand exactly to t#1..t#tf per
    distinct token, and (b) make multiplicity visible: 'a a a b' vs
    'a b' share only {a#1, b#1} of {a#1,a#2,a#3,b#1} (weighted J =
    1/2), while DISTINCT-token MinHash sees identical sets (J = 1) —
    the false-merge the weighted row exists to prevent."""
    from pyspark.sql import functions as F

    from mcp_server_vector_search_spark.operators.dedup import (
        weighted_elements_expr,
    )

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["e"]
        for r in df.select(
            "doc_id", weighted_elements_expr(F.col("text")).alias("e")
        ).collect()
    }
    assert sorted(rows[1]) == ["a#1", "a#2", "a#3", "b#1"]
    assert sorted(rows[2]) == ["a#1", "b#1"]
    inter = set(rows[1]) & set(rows[2])
    union = set(rows[1]) | set(rows[2])
    assert len(inter) / len(union) == 0.5  # weighted J, exact
