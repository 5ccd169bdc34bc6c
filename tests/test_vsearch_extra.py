"""Semantic properties of the serve-path extras and selection operators
— beyond the oracle equality already enforced by test_oracle_parity.

Each check validates the operator's CLAIM, not just its plumbing:
filtered search must respect the predicate AND stay near-exact;
tombstoned ids must never surface; MMR must actually diversify; maxsim
must equal the brute-force late-interaction score; SemDeDup's
drop-set must be exactly the dominance rule; DSIR must rank
target-distribution documents above the corpus base rate.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcp_server_vector_search_spark.operators import data_selection as ds
from mcp_server_vector_search_spark.operators import vsearch_extra as vx
from mcp_server_vector_search_spark.operators.topk import QUERY_VEC_ID
from mcp_server_vector_search_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS


@pytest.fixture(scope="module")
def emb_np(spark):
    rows = (
        load_table(spark, SF_CORRECTNESS, "embeddings")
        .select("vec_id", "embedding", "label")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([[float(v) for v in r["embedding"]] for r in rows])
    labels = np.array([r["label"] for r in rows])
    return ids, x / np.linalg.norm(x, axis=1, keepdims=True), labels


def _exact_topk(ids, unit, mask, qvec, k=10):
    scores = np.round((1.0 + unit @ qvec) / 2.0, 6)
    cand = [(-scores[i], ids[i]) for i in range(len(ids)) if mask[i]]
    return [int(v) for _, v in sorted(cand)[:k]]


def test_filtered_respects_predicate_and_recall(spark, emb_np):
    ids, unit, labels = emb_np
    out = vx.q_ann_filtered_topk(spark, SF_CORRECTNESS).collect()
    assert all(r["label"] <= 4 for r in out)
    qvec = unit[np.where(ids == QUERY_VEC_ID)[0][0]]
    exact = _exact_topk(ids, unit, labels <= 4, qvec)
    got = [r["vec_id"] for r in out]
    assert len(set(got) & set(exact)) / len(exact) >= 0.9


def test_tombstone_excludes_deleted_and_recall(spark, emb_np):
    ids, unit, _ = emb_np
    out = vx.q_ann_delete_tombstone(spark, SF_CORRECTNESS).collect()
    assert all(r["vec_id"] % 7 != 3 for r in out)
    qvec = unit[np.where(ids == QUERY_VEC_ID)[0][0]]
    exact = _exact_topk(ids, unit, ids % 7 != 3, qvec)
    got = [r["vec_id"] for r in out]
    assert len(set(got) & set(exact)) / len(exact) >= 0.9


def test_mmr_diversifies_without_losing_the_head(spark, emb_np):
    ids, unit, _ = emb_np
    qvec = unit[np.where(ids == QUERY_VEC_ID)[0][0]]
    plain = _exact_topk(ids, unit, np.ones(len(ids), bool), qvec, k=vx.MMR_K)
    out = vx.q_topk_mmr_diverse(spark, SF_CORRECTNESS).collect()
    sel = [r["vec_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]
    # rank 1 is pure relevance — identical to the exact top hit
    assert sel[0] == plain[0]
    row = {int(v): i for i, v in enumerate(ids)}

    def max_pairwise(members):
        m = unit[[row[v] for v in members]]
        s = m @ m.T
        np.fill_diagonal(s, -1)
        return float(s.max())

    # never LESS spread than the plain head (the synthetic embeddings are
    # isotropic, so the gain can be zero — the redundant-corpus case where
    # MMR provably reorders is test_mmr_select_drops_near_duplicate)
    assert max_pairwise(sel) <= max_pairwise(plain)
    # and still relevant: mean score within 90% of the plain head's
    rel = np.round((1.0 + unit @ qvec) / 2.0, 6)
    assert rel[[row[v] for v in sel]].mean() >= 0.9 * rel[[row[v] for v in plain]].mean()


def test_mmr_select_drops_near_duplicate():
    """The mechanism check: a corpus of {a, a', b} where a' ≈ a (both
    highly relevant) and b is moderately relevant but orthogonal.
    Relevance-only top-2 returns the duplicate pair {a, a'}; MMR must
    swap the duplicate for the diverse b."""
    q = np.array([0.8, 0.6, 0.0])
    a = np.array([1.0, 0.0, 0.0])
    a2 = np.array([0.9999, -0.0141, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    vecs = np.stack([a, a2, b])
    # relevance order is a (0.9) > a' (0.896) > b (0.8): plain top-2 = {a, a'}
    sel = vx.mmr_select([10, 11, 12], vecs, q, k=2)
    assert sel == [10, 12]  # a then b — a' (id 11) displaced despite rank-2 relevance


def test_maxsim_equals_bruteforce(spark, emb_np):
    ids, unit, _ = emb_np
    qs = unit[[np.where(ids == q)[0][0] for q in vx.MAXSIM_QUERY_IDS]]
    sims = np.round((1.0 + unit @ qs.T) / 2.0, 6)  # n × |Q|
    groups = ids // vx.MAXSIM_GROUP
    expected = {}
    for g in np.unique(groups):
        m = sims[groups == g]
        expected[int(g)] = round(float(np.sum(np.max(m, axis=0))), 6)
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[: vx.MAXSIM_K]
    out = vx.q_maxsim_multivector(spark, SF_CORRECTNESS).collect()
    got = [(r["doc_group"], r["maxsim_score"]) for r in out]
    assert [g for g, _ in got] == [g for g, _ in top]
    for (_, a), (_, b) in zip(got, top):
        assert a == pytest.approx(b, abs=2e-6)


def test_semdedup_drop_set_is_exact_dominance(spark, emb_np):
    from mcp_server_vector_search_spark.operators.ann import (
        ASSIGN_DECIMALS,
        TRAIN_SAMPLE,
        train_centroids,
    )

    ids, unit, _ = emb_np
    cents = np.asarray(train_centroids([list(v) for v in unit[:TRAIN_SAMPLE]]))
    assign = np.argmax(np.round(unit @ cents.T, ASSIGN_DECIMALS), axis=1)
    sims = np.round(unit @ unit.T, ASSIGN_DECIMALS)
    expected = set()
    for j in range(len(ids)):
        for i in range(j):
            if assign[i] == assign[j] and sims[i, j] >= ds.SEMDEDUP_T:
                expected.add(int(ids[j]))
                break
    out = ds.q_semdedup_prune(spark, SF_CORRECTNESS).collect()
    assert {r["vec_id"] for r in out} == expected
    assert expected  # non-trivial at the correctness SF


def test_dsir_ranks_target_language_above_base_rate(spark):
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    base = docs.where(F.expr(ds.TARGET_SQL)).count() / docs.count()
    top = ds.q_dsir_importance_weights(spark, SF_CORRECTNESS)
    joined = top.join(docs.select("doc_id", "lang"), "doc_id").collect()
    frac_en = sum(1 for r in joined if r["lang"] == "en") / len(joined)
    assert frac_en > base  # importance weighting upranks the target dist
    assert all(r["n_bigrams"] > 0 for r in joined)


def test_phash_identical_images_collide_distinct_do_not(spark):
    """aHash must be a function of pixels alone: identical pixel arrays
    (regardless of PNG filter type used at encode time) collide, and
    the synthetic corpus's distinct patterns stay distinct."""
    from mcp_server_vector_search_spark.functions.png import encode_png
    from mcp_server_vector_search_spark.sources.multimodal import (
        ahash_bits,
        synthetic_image,
    )
    import numpy as np

    img = synthetic_image(7)
    # same pixels through two different scanline filters -> same hash
    from mcp_server_vector_search_spark.functions.png import decode_png

    h1 = ahash_bits(decode_png(encode_png(img, filter_type=0)))
    h2 = ahash_bits(decode_png(encode_png(img, filter_type=4)))
    assert h1 == h2 and len(h1) == 64 and set(h1) <= {"0", "1"}
    # a genuinely different pattern hashes differently
    assert ahash_bits(synthetic_image(8)) != h1
    # constant image: no pixel exceeds the mean -> all-zero hash
    assert ahash_bits(np.full((16, 16), 9, dtype=np.uint8)) == "0" * 64


def test_perplexity_penalizes_unpredictable_text(spark):
    """On a corpus where one document is perfectly predictable (one
    repeated bigram) and another is all-singleton bigrams, the
    self-trained LM must give the predictable document a strictly
    lower average NLL."""
    from mcp_server_vector_search_spark.operators.data_selection import (
        perplexity_scores,
    )

    rows = [
        (1, " ".join(["alpha", "beta"] * 12)),  # 'alpha beta' dominates
        (2, " ".join(f"tok{i}" for i in range(24))),  # every bigram unique
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["avg_nll_micro"] for r in perplexity_scores(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1] < out[2]
    assert all(v > 0 for v in out.values())


def test_perplexity_head_on_corpus(spark):
    from mcp_server_vector_search_spark.operators.data_selection import (
        perplexity_scores,
    )

    out = perplexity_scores(load_table(spark, SF_CORRECTNESS, "documents")).collect()
    assert len(out) == 20
    assert all(r["avg_nll_micro"] > 0 and r["n_bigrams"] > 0 for r in out)
    # ordered worst-first
    vals = [r["avg_nll_micro"] for r in out]
    assert vals == sorted(vals, reverse=True)


def test_batch_ann_matches_per_query_ivf(spark, emb_np):
    """The batched scan must return exactly what B independent
    `ivf_topk` calls would — amortization cannot change results."""
    from mcp_server_vector_search_spark.operators.ann import (
        ivf_topk,
        load_or_build_ivf_index,
    )

    ids, unit, _ = emb_np
    indexed, cents = load_or_build_ivf_index(spark, SF_CORRECTNESS)
    out = vx.q_ann_batch_ivf_topk(spark, SF_CORRECTNESS).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["score"]))
    assert set(by_q) == set(range(vx.BATCH_Q))
    for qid in range(vx.BATCH_Q):
        qvec = [float(v) for v in unit[np.where(ids == qid)[0][0]]]
        solo = [
            (r["vec_id"], r["score"])
            for r in ivf_topk(indexed, cents, qvec).collect()
        ]
        assert by_q[qid] == solo


def test_index_stats_cover_corpus_and_sum_to_one(spark):
    out = vx.q_ann_index_stats(spark, SF_CORRECTNESS).collect()
    n = sum(r["n_vectors"] for r in out)
    from mcp_server_vector_search_spark.sources.tables import load_table as lt

    assert n == lt(spark, SF_CORRECTNESS, "embeddings").count()
    # cell fractions sum to ~1 (rounding at micro precision)
    assert abs(sum(r["cell_frac_micro"] for r in out) - 1_000_000) <= len(out)
    assert all(r["min_vec_id"] <= r["max_vec_id"] for r in out)
    assert all(r["avg_norm_micro"] > 0 for r in out)


def test_pagerank_matches_integer_power_iteration(spark):
    """Mirror the unrolled integer recurrence in plain Python over the
    transition counts and demand exact equality — the operator is
    deterministic integer arithmetic, so there is no tolerance."""
    from collections import Counter

    from mcp_server_vector_search_spark.operators.windows import (
        PR_BASE,
        PR_D_DEN,
        PR_D_NUM,
        PR_INIT,
        PR_ITERS,
        q_events_pagerank_states,
    )

    rows = (
        load_table(spark, SF_CORRECTNESS, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    edges = Counter()
    for evs in by_user.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for a, b in zip(evs, evs[1:]):
            edges[(a["event_type"], b["event_type"])] += 1
    states = sorted({r["event_type"] for r in rows})
    outw = Counter()
    for (u, _), n in edges.items():
        outw[u] += n
    rank = {s: PR_INIT for s in states}
    for _ in range(PR_ITERS):
        inflow = Counter()
        for (u, v), n in edges.items():
            inflow[v] += (rank[u] * n) // outw[u]
        rank = {
            s: PR_BASE + (PR_D_NUM * inflow.get(s, 0)) // PR_D_DEN for s in states
        }
    out = {r["state"]: r["rank_micro"] for r in q_events_pagerank_states(spark, SF_CORRECTNESS).collect()}
    assert out == rank


def test_filtered_search_starves_gracefully(spark):
    """A highly selective predicate can leave fewer than k matches in
    the probed cells; the operator must return the short list (every
    row satisfying the predicate) rather than erroring or padding —
    the documented fixed-nprobe semantics."""
    from mcp_server_vector_search_spark.operators.ann import (
        load_or_build_ivf_index,
    )
    from mcp_server_vector_search_spark.operators.topk import QUERY_VEC_ID

    indexed, cents = load_or_build_ivf_index(spark, SF_CORRECTNESS)
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    qvec = [
        float(v)
        for v in emb.where(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    ]
    out = vx.filtered_ivf_topk(
        indexed, cents, qvec, F.col("vec_id") % 97 == 0
    ).collect()
    assert 0 < len(out) <= vx.K
    assert all(r["vec_id"] % 97 == 0 for r in out)


def test_adaptive_filtered_recovers_from_starvation(spark):
    """The registered predicate leaves < k rows in the default probe
    set; escalation must widen nprobe and return EXACTLY k rows — the
    recovery the fixed-nprobe operator documents as out of scope."""
    from mcp_server_vector_search_spark.operators.ann import (
        NPROBE,
        load_or_build_ivf_index,
    )
    from mcp_server_vector_search_spark.operators.topk import QUERY_VEC_ID

    indexed, cents = load_or_build_ivf_index(spark, SF_CORRECTNESS)
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    qvec = [
        float(v)
        for v in emb.where(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    ]
    # precondition: the default probe budget really starves
    starved = vx.filtered_ivf_topk(
        indexed, cents, qvec, F.expr(vx.ADAPTIVE_FILTER_SQL)
    ).collect()
    assert len(starved) < vx.K
    out, final_np = vx.adaptive_filtered_topk(
        indexed, cents, qvec, F.expr(vx.ADAPTIVE_FILTER_SQL)
    )
    rows = out.collect()
    assert len(rows) == vx.K
    assert final_np > NPROBE
    assert all(r["vec_id"] % 43 == 0 for r in rows)


def test_adaptive_filtered_no_escalation_when_satisfied(spark):
    """An unselective predicate must return in one rung at the default
    nprobe — escalation is the exception path, not a constant tax."""
    from mcp_server_vector_search_spark.operators.ann import (
        NPROBE,
        load_or_build_ivf_index,
    )
    from mcp_server_vector_search_spark.operators.topk import QUERY_VEC_ID

    indexed, cents = load_or_build_ivf_index(spark, SF_CORRECTNESS)
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    qvec = [
        float(v)
        for v in emb.where(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    ]
    out, final_np = vx.adaptive_filtered_topk(
        indexed, cents, qvec, F.expr(vx.FILTER_SQL)
    )
    assert final_np == NPROBE
    assert len(out.collect()) == vx.K


def test_adaptive_filtered_short_when_corpus_starved(spark):
    """When the whole corpus holds fewer than k matches, the ladder
    must end at the full filtered scan and return every match — short,
    never erroring, never padding."""
    from mcp_server_vector_search_spark.operators.ann import (
        load_or_build_ivf_index,
    )
    from mcp_server_vector_search_spark.operators.topk import QUERY_VEC_ID

    indexed, cents = load_or_build_ivf_index(spark, SF_CORRECTNESS)
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    total = emb.where(F.col("vec_id") % 97 == 0).count()
    assert total < vx.K  # fixture precondition
    qvec = [
        float(v)
        for v in emb.where(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    ]
    out, final_np = vx.adaptive_filtered_topk(
        indexed, cents, qvec, F.col("vec_id") % 97 == 0
    )
    rows = out.collect()
    assert len(rows) == total
    assert final_np == len(cents)


def test_maintenance_skewed_append_triggers_exact_cells(spark):
    """A skewed upsert (40 re-embedded rows all moving from cell 7 to
    cell 3 in a balanced 16-cell index) must flag exactly cell 3
    overfull and put exactly {3, 7} on the rewrite work list — the
    gaining cell AND the losing cell, nothing else."""
    base_old = [(i * 100 + c, c, 0) for c in range(16) for i in range(12)]
    moved_old = [(9000 + i, 7, 1) for i in range(40)]
    moved_new = [(9000 + i, 3, 1) for i in range(40)]
    schema = "vec_id long, centroid_id int, upd int"
    assigned_old = spark.createDataFrame(base_old + moved_old, schema)
    assigned_new = spark.createDataFrame(base_old + moved_new, schema)
    plan = {
        r["centroid_id"]: r
        for r in vx.maintenance_plan(assigned_old, assigned_new).collect()
    }
    assert len(plan) == 16
    assert plan[3]["flag"] == "overfull" and plan[3]["n_updated"] == 40
    assert plan[7]["n_lost"] == 40 and plan[7]["flag"] == "ok"
    rewrite = {c for c, r in plan.items() if r["needs_rewrite"]}
    assert rewrite == {3, 7}
    for c, r in plan.items():
        if c not in (3, 7):
            assert r["flag"] == "ok" and not r["needs_rewrite"]


def test_planned_filtered_jumps_in_one_rung(spark):
    """The selectivity estimate must pick the escalated probe set in
    ONE rung for the starving 1-in-43 predicate — the whole point over
    the reactive doubling ladder — and still return exactly k rows
    matching the predicate."""
    from mcp_server_vector_search_spark.operators.ann import (
        NPROBE,
        load_or_build_ivf_index,
    )
    from mcp_server_vector_search_spark.operators.topk import QUERY_VEC_ID

    indexed, cents = load_or_build_ivf_index(spark, SF_CORRECTNESS)
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    qvec = [
        float(v)
        for v in emb.where(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    ]
    out, final_np, rungs = vx.planned_filtered_topk(
        indexed, cents, qvec, F.expr(vx.ADAPTIVE_FILTER_SQL)
    )
    rows = out.collect()
    assert rungs == 1, "estimate should land without reactive retries"
    assert final_np > NPROBE
    assert len(rows) == vx.K
    assert all(r["vec_id"] % 43 == 0 for r in rows)
    # planned and adaptive must agree on the answer set
    adaptive, _ = vx.adaptive_filtered_topk(
        indexed, cents, qvec, F.expr(vx.ADAPTIVE_FILTER_SQL)
    )
    assert sorted(r["vec_id"] for r in rows) == sorted(
        r["vec_id"] for r in adaptive.collect()
    )


def test_planned_nprobe_arithmetic():
    """Pure-arithmetic contract pins: m=0 -> full scan; plentiful
    matches -> default nprobe; sparse matches -> 2x-safety ceil."""
    assert vx._planned_nprobe(t=40, m=0, k=10, nprobe=10, n_cells=16) == 16
    assert vx._planned_nprobe(t=40, m=30, k=10, nprobe=10, n_cells=16) == 10
    assert vx._planned_nprobe(t=40, m=1, k=10, nprobe=10, n_cells=16) == 16
    assert vx._planned_nprobe(t=40, m=4, k=10, nprobe=2, n_cells=64) == 6
