"""Pallas fused-scan kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles for real TPU via Mosaic)."""

import numpy as np
import pytest

import naive
from krep_tpu.ops import dispatch, literal, pallas_scan


def run_pallas(text: bytes, pattern: bytes, **kw):
    arr, n = dispatch.stage_text(text)
    want_mask = kw.pop("want_mask", True)
    c, l, mask = pallas_scan.scan_literal(
        arr, n, pattern=pattern, want_mask=want_mask, interpret=True, **kw
    )
    starts = np.flatnonzero(np.asarray(mask)[: len(text)]).tolist() if want_mask else None
    return int(c), int(l), starts


CASES = [
    (b"abababa", b"aba"),
    (b"aaaaa", b"aa"),
    (b"the theme thread\nthe end", b"the"),
    (b"hello", b"hello"),
    (b"x" * 100000 + b"needle" + b"y" * 100000, b"needle"),
]


@pytest.mark.parametrize("text,pat", CASES)
def test_counts_and_mask(text, pat):
    c, l, starts = run_pallas(text, pat)
    want = naive.all_starts(text, pat)
    assert starts == want
    assert c == len(want)
    assert l == naive.matched_lines(text, want)


@pytest.mark.parametrize("cs", [True, False])
@pytest.mark.parametrize("ww", [True, False])
def test_random_corpus_modes(cs, ww):
    text = naive.gen_corpus(11, 70_000)  # spans two tiles
    for pat in [b"the", b"e", b"TH", b"quick", b"e q"]:
        c, l, starts = run_pallas(text, pat, case_sensitive=cs, whole_word=ww)
        want = naive.all_starts(text, pat, case_sensitive=cs, whole_word=ww)
        assert starts == want, (pat, cs, ww)
        assert c == len(want)
        assert l == naive.matched_lines(text, want)


def test_tile_boundary_matches():
    """Matches and lines straddling the 64KiB tile boundary."""
    T = pallas_scan.TILE_ROWS * pallas_scan.LANES  # 65536
    body = bytearray(b"x" * (3 * T))
    for pos in [T - 3, T - 1, T, 2 * T - 2, 2 * T]:
        body[pos : pos + 5] = b"match"
    # a single line spanning the whole buffer except a few newlines
    body[100] = 0x0A
    body[T + 7] = 0x0A
    text = bytes(body)
    c, l, starts = run_pallas(text, b"match")
    want = naive.all_starts(text, b"match")
    assert starts == want
    assert l == naive.matched_lines(text, want)


def test_word_boundary_across_tiles():
    T = pallas_scan.TILE_ROWS * pallas_scan.LANES
    body = bytearray(b" " * (2 * T))
    body[T - 4 : T + 1] = b"word_"   # '_' after → not whole word
    body[T + 10 : T + 14] = b"word"
    text = bytes(body)
    c, l, starts = run_pallas(text, b"word", whole_word=True)
    want = naive.all_starts(text, b"word", whole_word=True)
    assert starts == want


def test_long_pattern_multirow_shift():
    """Pattern longer than 128 bytes exercises row-shifted compares."""
    pat = bytes(range(65, 91)) * 6  # 156 bytes
    text = b"z" * 70000 + pat + b"z" * 70000 + pat
    c, l, starts = run_pallas(text, pat)
    want = naive.all_starts(text, pat)
    assert starts == want
    assert c == 2


def test_line_carry_state_across_tiles():
    """A line with matches in two tiles counts once."""
    T = pallas_scan.TILE_ROWS * pallas_scan.LANES
    text = b"ab " * (T // 3) + b"ab ab\n" + b"ab " * 100
    c, l, starts = run_pallas(text, b"ab")
    want = naive.all_starts(text, b"ab")
    assert c == len(want)
    assert l == naive.matched_lines(text, want)
