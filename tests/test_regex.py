"""POSIX ERE parity vs the reference binary and the reference test corpus
(mirrors test/test_regex.c themes: classes, alternation, anchors with
REG_NEWLINE, empty-text ^$, non-overlap, max_count, exact offsets)."""

import io
import os
import tempfile

import pytest

import naive
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


def test_regex_compile_error_exit2():
    got, rc, want, wrc = both(b"abc\n", ["-E", "[unclosed"])
    assert rc == wrc == 2


def test_leftmost_longest_semantics():
    """POSIX picks the longest alternative — Python re would pick the first."""
    p = SearchParams(patterns=(b"a|ab|abc",), use_regex=True, only_matching=True)
    r = search_string(p, b"xxabcxx")
    assert r.positions.tolist() == [[2, 5]]  # abc, not just 'a'
