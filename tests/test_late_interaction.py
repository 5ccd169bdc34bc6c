"""Late-interaction (MaxSim) retrieval — operator-level checks beyond
the registered row's oracle hash."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from mcp_server_vector_search_spark.operators import late_interaction as LI
from mcp_server_vector_search_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS


def test_token_unit_deterministic_and_unit():
    a = LI.token_unit("spark")
    b = LI.token_unit("spark")
    assert a == b and len(a) == LI.MAXSIM_DIM
    assert abs(math.sqrt(sum(x * x for x in a)) - 1.0) < 1e-12


def test_maxsim_matches_bruteforce_numpy(spark):
    """The distributed MaxSim equals a straightforward numpy
    brute-force over the same truncated token bags (set semantics:
    duplicate tokens cannot change a max)."""
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    got = [(r.doc_id, r.score) for r in LI.maxsim_topk(docs).collect()]

    rows = docs.select("doc_id", "text").collect()
    qmat = LI.query_token_matrix()
    from mcp_server_vector_search_spark.operators.lifecycle import _seq_dot
    from mcp_server_vector_search_spark.operators.vsearch_extra import _round6

    cache: dict[str, list[float]] = {}
    scored = []
    for r in rows:
        toks = set((r.text or "").split(" ")[: LI.MAXSIM_DOC_TOKENS])
        maxes = [-2.0] * len(qmat)
        for t in toks:
            v = cache.setdefault(t, LI.token_unit(t))
            for i, qv in enumerate(qmat):
                s = _round6(_seq_dot(v, qv))
                if s > maxes[i]:
                    maxes[i] = s
        acc = 0.0
        for m in maxes:
            acc += m
        scored.append((-_round6(acc), r.doc_id))
    scored.sort()
    want = [(d, -s) for s, d in scored[: LI.MAXSIM_K]]
    assert got == want


def test_maxsim_exact_term_docs_score_full(spark):
    """A document containing every query token verbatim (within the
    truncation window) must score exactly Q x 1.0 — the MaxSim analog
    of an exact match — and rank above any document missing a term."""
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    q_toks = LI.MAXSIM_QUERY.split(" ")
    containing = {
        r.doc_id
        for r in docs.where(
            " AND ".join(
                f"array_contains(slice(split(text, ' '), 1, "
                f"{LI.MAXSIM_DOC_TOKENS}), '{t}')"
                for t in q_toks
            )
        ).collect()
    }
    top = LI.maxsim_topk(docs, k=len(containing) + 5).collect()
    full = [r.doc_id for r in top if r.score == float(len(q_toks))]
    assert set(full) <= containing
    if containing:
        assert len(full) == min(len(containing), len(top))


def test_maxsim_dedups_tokens_before_embed(spark):
    """The embed + sims factor through the token VOCABULARY: per-doc
    dedup is map-side (array_distinct inside the explode input), the
    Arrow UDF runs only on the distinct-token table (under the
    broadcast), the (doc, token) stream joins it map-side with ZERO
    shuffles of its own, and the per-doc reduction runs as a
    partial_max map-side combine."""
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    plan = LI.maxsim_topk(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, "token embed must be Arrow-batched"
    assert "array_distinct" in plan, "map-side token dedup missing"
    assert "partial_max" in plan, "map-side combine missing"
    assert "BroadcastHashJoin" in plan, "vocab sims must join map-side"
    # the Arrow embed runs on the vocab INSIDE the broadcast build side,
    # never over the doc-token stream
    bcast_subtree = plan.split("BroadcastExchange", 1)[1]
    assert "ArrowEvalPython" in bcast_subtree, "embed must be vocab-side"
    # exactly TWO hash exchanges: the vocab distinct (tiny) and the
    # per-doc rollup — the heavy doc-token stream itself never shuffles
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("BroadcastExchange") == 1, plan
