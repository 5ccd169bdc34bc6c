"""Aho-Corasick multi-pattern scan: automaton counts vs per-pattern
brute force, nested-hit emission, border-free precondition."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mcp_server_vector_search_spark.operators.curation import (
    BLOCKLIST_PATTERNS,
    _border_free,
    ac_scan_counts,
    build_aho_corasick,
)

GOTO, FAIL, OUT = build_aho_corasick(BLOCKLIST_PATTERNS)
N = len(BLOCKLIST_PATTERNS)


def brute_counts(text: str) -> list[int]:
    """All-occurrences count per pattern via explicit position scan —
    the definitionally-correct reference."""
    out = []
    for p, _ in BLOCKLIST_PATTERNS:
        c, i = 0, text.find(p)
        while i != -1:
            c += 1
            i = text.find(p, i + 1)  # +1 = overlapping semantics
        out.append(c)
    return out


def test_nested_dictionary_hit():
    """'fast sort' contains pattern 'ast': one pass must emit BOTH —
    the dictionary-suffix case a per-pattern loop needs N passes for."""
    counts = ac_scan_counts("run fast sort now", GOTO, FAIL, OUT, N)
    got = {p: c for (p, _), c in zip(BLOCKLIST_PATTERNS, counts) if c}
    assert got == {"fast sort": 1, "ast": 1}


def test_prefix_pattern_and_phrase_both_fire():
    """'slow' is a prefix of 'slow scan': both fire on the phrase."""
    counts = ac_scan_counts("a slow scan here", GOTO, FAIL, OUT, N)
    got = {p: c for (p, _), c in zip(BLOCKLIST_PATTERNS, counts) if c}
    assert got == {"slow scan": 1, "slow": 1, "can": 1}


def test_matches_brute_force_on_corpus_shaped_text():
    text = (
        "key agg row scan slow fast sort table dup value big part "
        "customer stream merge batch slow scan fast sort dup dup"
    )
    assert ac_scan_counts(text, GOTO, FAIL, OUT, N) == brute_counts(text)


ALPHABET = "abcdefghijklmnopqrstuvwxyz "


@given(st.text(alphabet=ALPHABET, max_size=300))
@settings(max_examples=150, deadline=None)
def test_matches_brute_force_property(text):
    assert ac_scan_counts(text, GOTO, FAIL, OUT, N) == brute_counts(text)


def test_all_patterns_border_free():
    assert all(_border_free(p) for p, _ in BLOCKLIST_PATTERNS)
    # and the checker itself distinguishes: these have borders
    assert not _border_free("table table")
    assert not _border_free("aa")
    assert not _border_free("abab")
