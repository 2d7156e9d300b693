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


def _count_scan_shard_calls(monkeypatch):
    """Wrap pallas_swar.scan_shard to count slab launches."""
    from krep_tpu.ops import pallas_swar

    calls = {"n": 0}
    orig = pallas_swar.scan_shard

    def counting(*args, **kwargs):
        calls["n"] += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_swar, "scan_shard", counting)
    return calls


def test_slabbed_max_count_early_exit_stops_launching(monkeypatch):
    """-m reached in the first slab must stop launching later slabs
    (krep.c:1366-1367 lifted to slab granularity) while staying exact."""
    # matches only at the very front; 8 slabs of 100k
    text = b"the cat\n" * 1000 + b"x" * 792_000
    want = naive.all_starts(text, b"the")

    for mode, expect in [
        ({"count_mode": True}, 5),                             # -c, 5 lines
        ({"count_mode": True, "only_matching": True}, 5),      # -c -o, 5 matches
        ({"only_matching": True}, 5),                          # -o positions
        ({}, 5),                                               # default positions
    ]:
        calls = _count_scan_shard_calls(monkeypatch)
        p = SearchParams(patterns=(b"the",), max_count=5, **mode)
        r = slabbed(p, text, 100_000)
        assert r.count == expect, mode
        # WINDOW=2 pipelining launches at most 1 + WINDOW + 1 slabs before
        # the first drain observes the cap
        assert calls["n"] <= 4, (mode, calls["n"])
        if not p.count_lines_mode and p.track_positions and not p.count_matches_mode:
            assert r.positions[:, 0].tolist() == want[:5]
        monkeypatch.undo()


def test_slabbed_max_count_exactness_vs_unslabbed():
    """Early exit never changes results: slabbed+capped == naive truncation
    for every mode, including caps that land mid-slab and past-the-end."""
    text = naive.gen_english(17, 300_000)
    starts = naive.all_starts(text, b"the")
    nmatch = len(starts)
    for mc in [0, 1, 3, nmatch - 1, nmatch, nmatch + 5]:
        p = SearchParams(patterns=(b"the",), only_matching=True, max_count=mc)
        r = slabbed(p, text, 60_000)
        assert r.positions[:, 0].tolist() == starts[:mc], mc

        pc = SearchParams(patterns=(b"the",), count_mode=True, max_count=mc)
        rc = slabbed(pc, text, 60_000)
        assert rc.count == min(naive.matched_lines(text, starts), mc), mc


def slabbed_xla(params, text, slab_bytes):
    """Drive the slab loop through the non-SWAR shard engine
    (interpret=False on the CPU test backend routes to the vectorized
    numpy literal.scan_shard_host)."""
    old = search_mod.SLAB_BYTES
    search_mod.SLAB_BYTES = slab_bytes
    try:
        sel = select_algorithm(params)
        policy = sel.policy(params.only_matching)
        return search_mod._search_single_literal_slabbed(
            params, text, policy, interpret=False
        )
    finally:
        search_mod.SLAB_BYTES = old


def test_slabbed_xla_backend_parity():
    """VERDICT r2 item 7: the slab loop must work on non-SWAR backends (the
    reference's chunker works in any build, krep.c:2816-2829). Same cases
    as the SWAR-interpret test, via literal.scan_shard_xla."""
    text = naive.gen_english(91, 300_000)
    for pat, mode in [
        (b"the", {}),
        (b"the", {"count_mode": True}),
        (b"the", {"count_mode": True, "only_matching": True}),
        (b"quick", {"whole_word": True}),
        (b"THE", {"case_sensitive": False}),
    ]:
        p = SearchParams(patterns=(pat,), **mode)
        r = slabbed_xla(p, text, 100_000)
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


def test_slabbed_xla_boundary_and_word():
    text = bytearray(b" " * 250_000)
    for pos in [99_997, 99_999, 100_000, 199_998]:
        text[pos : pos + 6] = b"needle"
    text[100_000 - 2 : 100_000 + 1] = b"abc"  # word straddling boundary
    text = bytes(text)
    p = SearchParams(patterns=(b"needle",), whole_word=True)
    r = slabbed_xla(p, text, 100_000)
    assert r.positions[:, 0].tolist() == naive.all_starts(
        text, b"needle", whole_word=True
    )


def test_slabbed_xla_newline_pattern_line_count():
    """-c with a pattern containing '\\n' whose matches straddle slab
    boundaries: halo newlines must not double-count the boundary line
    (ADVICE r2 start_limit finding, both kernels)."""
    unit = b"x" * 9_999 + b"a\nb"  # 'a\nb' matches cross line boundaries
    text = (unit * 30)[:300_000]
    p = SearchParams(patterns=(b"a\nb",), count_mode=True)
    want_starts = naive.all_starts(text, b"a\nb")
    want = naive.matched_lines(text, want_starts)
    assert slabbed_xla(p, text, 100_000).count == want
    assert slabbed(p, text, 100_000).count == want  # SWAR-interpret twin


@pytest.mark.slow_big
def test_xla_backend_2_5gib_memmap(tmp_path):
    """End-to-end: a 2.5 GiB memmap on the XLA backend must stream through
    the slab loop (it used to hit the 2 GiB staging guard because the loop
    was gated on the SWAR backend). Counts are computed per tiled block, so
    the expectation is exact."""
    block = (b"the quick brown fox\n" * 512 + b"thethe the\n")
    per_block_lines = sum(1 for ln in block.split(b"\n") if b"the" in ln)
    reps = (5 << 29) // len(block) + 1                # ≥ 2.5 GiB total
    per_iter = reps // 64 + 1
    path = tmp_path / "big.bin"
    with open(path, "wb") as f:
        chunk = block * per_iter
        for _ in range(64):
            f.write(chunk)
    written = per_iter * 64
    data = np.memmap(path, dtype=np.uint8, mode="r")
    assert data.shape[0] == written * len(block) > (5 << 29)

    p = SearchParams(patterns=(b"the",), count_mode=True)
    r = search_mod._search_single_literal(
        p, data, select_algorithm(p), threads=1
    )
    assert r.count == per_block_lines * written


def test_slabbed_max_count_nonoverlap_policy():
    """-m with the greedy non-overlap policy: the incremental cursor must
    agree with a full-text greedy pass."""
    text = b"abab" * 50_000  # dense overlapping matches, 2 slabs
    allstarts = naive.all_starts(text, b"abab")
    kept = naive.greedy_nonoverlap(allstarts, 4)
    for mc in [1, 7, 1000]:
        p = SearchParams(
            patterns=(b"abab",), algo_override="kmp", only_matching=True,
            max_count=mc,
        )
        r = slabbed(p, text, 100_000)
        assert r.positions[:, 0].tolist() == kept[:mc], mc
