"""Slab loop for over-sized single-device inputs (interpret mode, small
slab size injected for testability)."""

import numpy as np
import pytest

import naive
from krep_tpu import SearchParams
from krep_tpu.engine import search as search_mod
from krep_tpu.engine.select import select_algorithm


def slabbed(params, text, slab_bytes):
    old = search_mod.SLAB_BYTES
    search_mod.SLAB_BYTES = slab_bytes
    try:
        sel = select_algorithm(params)
        policy = sel.policy(params.only_matching)
        return search_mod._search_single_literal_slabbed(
            params, text, policy, interpret=True
        )
    finally:
        search_mod.SLAB_BYTES = old


def test_slabbed_counts_and_positions():
    text = naive.gen_english(91, 300_000)
    for pat, mode in [
        (b"the", {}),
        (b"the", {"count_mode": True}),
        (b"the", {"count_mode": True, "only_matching": True}),
        (b"quick", {"whole_word": True}),
        (b"THE", {"case_sensitive": False}),
    ]:
        p = SearchParams(patterns=(pat,), **mode)
        r = slabbed(p, text, 100_000)  # 3 slabs + boundary halos
        want = naive.all_starts(
            text, pat,
            case_sensitive=p.case_sensitive, whole_word=p.whole_word,
        )
        if p.count_lines_mode:
            assert r.count == naive.matched_lines(text, want), pat
        elif p.count_matches_mode:
            assert r.count == len(want), pat
        else:
            assert r.positions[:, 0].tolist() == want, pat


def test_slabbed_boundary_matches():
    """Matches straddling the slab boundary are found once via the halo."""
    text = bytearray(b"x" * 250_000)
    for pos in [99_997, 99_999, 100_000, 199_998, 199_999]:
        text[pos : pos + 6] = b"needle"
    text = bytes(text)
    p = SearchParams(patterns=(b"needle",))
    r = slabbed(p, text, 100_000)
    assert r.positions[:, 0].tolist() == naive.all_starts(text, b"needle")


def test_slabbed_whole_word_after_boundary():
    """The whole-word after-check at the last owned start needs one real
    byte beyond the match — a word char right after a slab boundary must
    reject the match (review regression)."""
    slab = 100_000
    body = bytearray(b" " * 250_000)
    body[slab - 2 : slab + 1] = b"abc"   # 'ab' ends exactly at the boundary
    body[slab + 10 : slab + 13] = b"ab "  # control: valid whole word
    text = bytes(body)
    p = SearchParams(patterns=(b"ab",), whole_word=True, count_mode=True,
                     only_matching=True)
    r = slabbed(p, text, slab)
    want = naive.all_starts(text, b"ab", whole_word=True)
    assert r.count == len(want) == 1


def test_mixed_multi_slabbed():
    """Multi-pattern mixed path iterates slabs (long member + boundary)."""
    from krep_tpu.ops import multi as multi_mod
    from krep_tpu.engine import search as sm

    longpat = bytes(range(33, 118))  # 85 bytes
    text = bytearray(naive.gen_corpus(7, 250_000))
    text[99_990 : 99_990 + 85] = longpat
    text[200_000 : 200_085] = longpat
    text = bytes(text)
    p = SearchParams(patterns=(longpat, b"the"), only_matching=True, count_mode=True)
    old = sm.SLAB_BYTES
    sm.SLAB_BYTES = 100_000
    try:
        r = multi_mod._search_multi_mixed(p, text, p.patterns)
    finally:
        sm.SLAB_BYTES = old
    want = len(naive.all_starts(text, longpat)) + len(naive.all_starts(text, b"the"))
    assert r.count == want


def test_slabbed_nonoverlap_across_boundary():
    """Greedy policy is applied globally, not per slab."""
    text = b"ab" * 150_000  # matches everywhere
    p = SearchParams(patterns=(b"abab",), algo_override="kmp", only_matching=True)
    r = slabbed(p, text, 100_000)
    want = naive.greedy_nonoverlap(naive.all_starts(text, b"abab"), 4)
    assert r.positions[:, 0].tolist() == want
