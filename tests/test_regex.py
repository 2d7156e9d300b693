"""POSIX ERE parity vs the reference binary and the reference test corpus
(mirrors test/test_regex.c themes: classes, alternation, anchors with
REG_NEWLINE, empty-text ^$, non-overlap, max_count, exact offsets)."""

import io
import os
import tempfile

import pytest

import naive
import numpy as np
import oracle
from krep_tpu import SearchParams, search_string, cli

pytestmark = pytest.mark.skipif(
    oracle.ensure_oracle() is None, reason="reference oracle unavailable"
)


def ours_cli(argv):
    out = io.BytesIO()
    rc = cli.main(argv, out=out)
    return out.getvalue(), rc


def both(text: bytes, args: list[str]):
    with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        got, rc = ours_cli([*args, path])
        want, wrc = oracle.run([*args, path])
        return got.replace(path.encode(), b"F"), rc, want.replace(path.encode(), b"F"), wrc
    finally:
        os.unlink(path)


TEXT = (
    b"Error: disk failed\n"
    b"warning: low memory\n"
    b"error: Network Failed\n"
    b"running and jumping and Singing\n"
    b"date: 2024-03-15 and 1999-12-31\n"
    b"empty\n\n"
    b"aaa bbb aaa\n"
)

REGEX_ARGS = [
    ["-E", "[Ee]rror"],
    ["-E", "-o", "[A-Z][a-z]+ing"],
    ["-E", "-c", "[a-z]+ed"],
    ["-E", "-o", "[0-9]{4}-[0-9]{2}-[0-9]{2}"],
    ["-E", "-o", "^error"],
    ["-E", "-o", "failed$"],
    ["-E", "-i", "-o", "FAILED"],
    ["-E", "-o", "a+"],
    ["-E", "-c", "-o", "a+"],
    ["-E", "-o", "a*"],            # zero-length matches
    ["-E", "-m", "2", "-o", "a+"],
    ["-E", "-w", "-o", "aaa"],
    ["-E", "-e", "Error", "-e", "warning", "-o"],
    ["-E", "-w", "-e", "aaa", "-e", "bbb", "-o"],
    ["-E", "-c", "^$"],
    ["-E", "-o", "an."],
]


@pytest.mark.parametrize("args", REGEX_ARGS, ids=lambda a: " ".join(a))
def test_regex_parity(args):
    got, rc, want, wrc = both(TEXT, args)
    assert got == want, args
    assert rc == wrc, args


def test_regex_on_corpus():
    text = naive.gen_english(9, 20_000)
    for args in (["-E", "-c", "[A-Z][a-z]+"], ["-E", "-c", "-o", "th(e|eme)"],
                 ["-E", "-o", "-m", "7", "[a-z]+ing"]):
        got, rc, want, wrc = both(text, args)
        assert got == want, args
        assert rc == wrc


def test_regex_empty_text():
    got, rc, want, wrc = both(b"", ["-E", "-c", "^$"])
    assert got == want and rc == wrc
    got, rc, want, wrc = both(b"", ["-E", "x"])
    assert got == want and rc == wrc


def test_newline_matching_ere_terminates():
    """`-E '\\s'` (or any pattern matching the '\\n' byte) hangs the
    reference binary in default print mode — the same same-line-skip bug
    as empty-matchable patterns, for one-byte matches OF the newline
    (KNOWN_DIVERGENCES #7; found by tools/soak_fuzz.py). We must
    terminate, print each matched line once, and stay byte-exact with
    the reference on the modes it does terminate on."""
    text = b"a b\ncd\n x\n"
    with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        got, rc = ours_cli(["-E", "\\s", path])
        lines = got.replace(path.encode() + b":", b"").splitlines()
        assert lines == [b"a b", b"cd", b" x"]
        assert rc == 0
        # terminating modes stay oracle-exact
        for args in (["-E", "-c", "\\s"], ["-E", "-o", "\\s"],
                     ["-E", "-c", "finger$|\\s"]):
            got, rc = ours_cli([*args, path])
            want, wrc = oracle.run([*args, path])
            assert got.replace(path.encode(), b"F") == want.replace(
                path.encode(), b"F"
            ), args
            assert rc == wrc, args
    finally:
        os.unlink(path)


def test_regex_compile_error_exit2():
    got, rc, want, wrc = both(b"abc\n", ["-E", "[unclosed"])
    assert rc == wrc == 2


def test_leftmost_longest_semantics():
    """POSIX picks the longest alternative — Python re would pick the first."""
    p = SearchParams(patterns=(b"a|ab|abc",), use_regex=True, only_matching=True)
    r = search_string(p, b"xxabcxx")
    assert r.positions.tolist() == [[2, 5]]  # abc, not just 'a'


def test_parallel_zero_length_boundary_ownership(monkeypatch):
    """Zero-length matches exactly at a chunk boundary ('^x*' after the
    chunk's trailing newline) must be counted ONCE: the chunk ending there
    drops them (drop_end), the next chunk re-finds them at its offset 0.
    Without the ownership rule every boundary double-counts — unlike the
    reference, whose threaded regex silently LOSES boundary matches
    (KNOWN_DIVERGENCES #2), ours must equal the sequential loop exactly."""
    from krep_tpu.engine import regex_engine
    from krep_tpu.params import SearchParams

    def tiny_chunks(n, data, workers):
        ranges, lo = [], 0
        while lo < n:
            hi = min(lo + 256, n)
            if hi < n:
                nl = data.find(b"\n", hi)
                hi = n if nl == -1 else nl + 1
            ranges.append((lo, hi))
            lo = hi
        return ranges

    monkeypatch.setattr(regex_engine, "_parallel_chunks", tiny_chunks)
    data = b"some text here\nmore x lines\n" * 40
    for pat in [b"^x*", b"^m?", b"(^|q)x*", b"x*", b"x*$"]:
        for mode in [{"only_matching": True}, {"count_mode": True},
                     {"only_matching": True, "count_mode": True}]:
            p = SearchParams(patterns=(pat,), use_regex=True, **mode)
            seq = regex_engine._search_regex_seq(p, data)
            par = regex_engine._search_regex_parallel(p, data, threads=8)
            assert par.count == seq.count, (pat, mode)
            assert np.array_equal(par.positions, seq.positions), (pat, mode)


def test_drop_end_native_vs_python():
    """The C loop's drop_end must mirror the Python loop's."""
    from krep_tpu.engine import regex_engine
    from krep_tpu.params import SearchParams

    chunk = b"some text here\nmore x lines\n"
    for pat in [b"^x*", b"x*", b"^$", b"e?"]:
        p = SearchParams(patterns=(pat,), use_regex=True, only_matching=True)
        for de in (False, True):
            rn = regex_engine._search_regex_seq(p, chunk, drop_end=de)
            rp = regex_engine._search_regex_seq(
                p, chunk, force_python=True, drop_end=de
            )
            assert rn.count == rp.count, (pat, de)
            assert np.array_equal(rn.positions, rp.positions), (pat, de)
        full = regex_engine._search_regex_seq(p, chunk)
        dropped = regex_engine._search_regex_seq(p, chunk, drop_end=True)
        boundary = (full.positions[:, 0] == len(chunk)).sum()
        assert full.count - dropped.count == boundary, pat
