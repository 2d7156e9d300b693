"""Whole-binary behavior: our CLI's stdout must be byte-identical to the
reference binary's for the same invocation (the analogue of the reference's
dup2-capture tests, test_krep.c:112-203)."""

import io
import os
import tempfile

import pytest

import naive
import oracle
from krep_tpu import cli

pytestmark = pytest.mark.skipif(
    oracle.ensure_oracle() is None, reason="reference oracle unavailable"
)


def ours(argv: list[str]) -> tuple[bytes, int]:
    out = io.BytesIO()
    rc = cli.main(argv, out=out)
    return out.getvalue(), rc


@pytest.fixture(scope="module")
def corpus_file():
    text = naive.gen_english(5, 30_000)
    with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    yield path, text
    os.unlink(path)


ARGSETS = [
    ["the"],
    ["-c", "the"],
    ["-o", "the"],
    ["-c", "-o", "the"],
    ["-i", "THE"],
    ["-i", "-o", "THE"],
    ["-w", "the"],
    ["-w", "-o", "fox"],
    ["-m", "3", "-o", "the"],
    ["-m", "2", "the"],
    ["-m", "0", "-c", "the"],
    ["-e", "the", "-e", "fox", "-o"],
    ["-e", "the", "-e", "fox", "-c"],
    ["--regexp", "the", "-e", "fox", "-c"],  # --regexp == -e (krep.c:3481)
    ["--algo", "bm", "-o", "aaa"],
    ["--algo", "kmp", "-c", "-o", "aaa"],
    ["zzqqxx"],          # no match
    ["-c", "zzqqxx"],
    ["e"],               # single char
    ["-o", "th"],        # len 2
    ["--color=always", "the"],
    ["--color=always", "-o", "the"],
    ["--no-simd", "-c", "-o", "aba"],
]


@pytest.mark.parametrize("args", ARGSETS, ids=lambda a: " ".join(a))
def test_stdout_parity_file(corpus_file, args):
    path, _ = corpus_file
    got, rc = ours([*args, path])
    want, want_rc = oracle.run([*args, path])
    assert got == want
    assert rc == want_rc


def test_stdout_parity_small_corners():
    cases = [
        (b"abababa", ["-o", "aba"]),
        (b"abababa", ["-c", "-o", "aba"]),
        (b"aaaaa", ["-o", "aa"]),
        (b"aaaaa", ["--algo", "bm", "-o", "aa"]),
        (b"the\nthe the\n", ["the"]),
        (b"no trailing newline the", ["the"]),
        (b"", ["x"]),
        (b"x\n\n\nx\n", ["x"]),
        (b"a\x00b ab\n", ["ab"]),
    ]
    for text, args in cases:
        with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
            f.write(text)
            path = f.name
        try:
            got, rc = ours([*args, path])
            want, want_rc = oracle.run([*args, path])
            assert got.replace(path.encode(), b"F") == want.replace(
                path.encode(), b"F"
            ), (text, args)
            assert rc == want_rc, (text, args)
        finally:
            os.unlink(path)


def test_corner_flags_parity(tmp_path):
    """1024-byte pattern, invalid -t (warn+default), -f - from stdin."""
    import sys

    text = b"x" * 5000 + b"q" * 1030 + b"x" * 100
    path = tmp_path / "t.txt"
    path.write_bytes(text)
    pat = "q" * 1024
    for args in (["-c", "-o", pat], ["-t", "abc", "-c", "q" * 4]):
        got, rc = ours([*args, str(path)])
        want, wrc = oracle.run([*args, str(path)])
        assert got.replace(str(path).encode(), b"F") == want.replace(
            str(path).encode(), b"F"
        )
        assert rc == wrc

    class FakeStdin:
        buffer = io.BytesIO(b"qqqq\nxx\n")

    old = sys.stdin
    sys.stdin = FakeStdin()
    try:
        got, rc = ours(["-f", "-", "-c", "-o", str(path)])
    finally:
        sys.stdin = old
    want, wrc = oracle.run(["-f", "-", "-c", "-o", str(path)], stdin=b"qqqq\nxx\n")
    assert got.replace(str(path).encode(), b"F") == want.replace(
        str(path).encode(), b"F"
    )
    assert rc == wrc


def test_string_mode_parity():
    for args, text in [
        (["-s", "the"], "the cat and the dog"),
        (["-o", "-s", "the"], "the cat and the dog"),
        (["-c", "-s", "the"], "the cat"),
        (["-s", "zz"], "nope"),
    ]:
        got, rc = ours([*args, text])
        want, want_rc = oracle.run([*args, text])
        assert got == want, (args, text)
        assert rc == want_rc


def test_recursive_parity(tmp_path):
    d = tmp_path / "tree"
    (d / "sub").mkdir(parents=True)
    (d / ".git").mkdir()
    (d / "node_modules").mkdir()
    (d / "a.txt").write_bytes(b"the cat\n")
    (d / "b.txt").write_bytes(b"nothing\n")
    (d / "sub" / "c.txt").write_bytes(b"the dog\nthe bird\n")
    (d / ".git" / "skip.txt").write_bytes(b"the x\n")
    (d / "app.min.js").write_bytes(b"the y\n")
    (d / "img.png").write_bytes(b"the z\n")
    (d / ".hidden.txt").write_bytes(b"the h\n")  # hidden FILE is searched

    for args in [["-r", "-c", "the"], ["-r", "the"], ["-r", "-o", "the"]]:
        got, rc = ours([*args, str(d)])
        want, want_rc = oracle.run([*args, str(d)])
        assert sorted(got.splitlines()) == sorted(want.splitlines()), args
        assert rc == want_rc, args


def test_gitignore_parity(tmp_path):
    d = tmp_path / "g"
    (d / "keep").mkdir(parents=True)
    (d / "drop").mkdir()
    (d / ".gitignore").write_text("drop/\n*.skip\n!keep.skip\n")
    (d / "a.txt").write_bytes(b"the a\n")
    (d / "b.skip").write_bytes(b"the b\n")
    (d / "keep.skip").write_bytes(b"the k\n")
    (d / "drop" / "c.txt").write_bytes(b"the c\n")
    (d / "keep" / "d.txt").write_bytes(b"the d\n")

    got, rc = ours(["-r", "--gitignore", "-c", "the", str(d)])
    want, want_rc = oracle.run(["-r", "--gitignore", "-c", "the", str(d)])
    assert sorted(got.splitlines()) == sorted(want.splitlines())
    assert rc == want_rc


def test_stdin_nul_truncation_parity():
    """Reference stdin delegates to search_string whose text_len is
    strlen(text) (krep.c:2025): stdin data truncates at the first NUL.
    File targets are binary-safe (mmap + stat size). Found by soak rig G
    on a binary corpus (round 4)."""
    from clirun import run_cli

    for data in (b"A\x00AAA", b"AA\x00AAA", b"\x00AAA", b"AAA\nA\x00A\n"):
        for args in (["-c", "-o", "A"], ["-c", "A"], ["-o", "A"], ["A"]):
            got, _, rc = run_cli(args, stdin_bytes=data)
            want, wrc = oracle.run(args, stdin=data)
            assert got == want, (data, args, got, want)
            assert rc == wrc, (data, args)


def test_max_count_invalid_values_warn_like_reference(tmp_path):
    """strtol semantics (krep.c:3511-3520): out-of-range or garbage -m
    values warn on stderr and are IGNORED (no abort)."""
    f = tmp_path / "t.txt"
    f.write_text("the cat\nthe dog the bird\nno match\n")
    for mval in ("18446744073709551615", "abc", "-3", "",
                 "1_0", "5 ", " 5", "+5", "\u0665"):
        args = ["-c", "-m", mval, "the", str(f)]
        want, wrc = oracle.run(args)
        out = io.BytesIO()
        rc = cli.main(args, out=out)
        assert out.getvalue().replace(str(f).encode(), b"F") == want.replace(
            str(f).encode(), b"F"
        ), mval
        assert rc == wrc, mval


def test_w_large_pattern_set_routes_mxu_whole_word(corpus_file):
    """-w with a K>=32 -f set: the count and print paths route through the
    MXU whole-word kernel (boundary dot) and must stay byte-identical to
    the reference (which covers this via Aho-Corasick + is_word_char,
    krep.c:1389-1420)."""
    path, text = corpus_file
    pats = []
    seen = set()
    i = 7
    while len(pats) < 40:
        p = text[i : i + 3 + (i % 6)]
        i += 11
        if b"\n" in p or not p or p in seen:
            continue
        seen.add(p)
        pats.append(p)
    with tempfile.NamedTemporaryFile(suffix=".pats", delete=False) as f:
        f.write(b"\n".join(pats) + b"\n")
        patfile = f.name
    try:
        for extra in (["-c"], [], ["-o"], ["-c", "-i"]):
            got, rc = ours(["-w", *extra, "-f", patfile, path])
            want, wrc = oracle.run(["-w", *extra, "-f", patfile, path])
            assert (got, rc) == (want, wrc), extra
    finally:
        os.unlink(patfile)


def test_multi_pattern_position_order_by_target_kind(tmp_path):
    """Position ORDER is target-dependent in the reference: file targets
    qsort merged results by start (krep.c:3020-3023); stdin and -s ride
    search_string, which prints matches exactly as the AC walk collected
    them — ascending (end, start), no sort (krep.c:2187+). 'bc' inside
    'abcd' makes the two orders observably different: emission puts the
    shorter, earlier-ending 'bc' FIRST; start-sort puts 'abcd' first."""
    from clirun import run_cli

    text = b"zabcdz\nxx abcd yy\nbc abcd\n"
    args = ["-o", "-e", "bc", "-e", "abcd"]

    # stdin: emission order
    got, _, rc = run_cli(args, stdin_bytes=text)
    want, _, wrc = oracle.run_full(args, stdin=text)
    assert (got, rc) == (want, wrc)
    assert got.splitlines()[0] == b"1:bc"  # emission order pinned

    # -s: same engine path, same order
    got_s, _, rc_s = run_cli([*args, "-s", "zz", text.decode()])
    want_s, _, wrc_s = oracle.run_full([*args, "-s", "zz", text.decode()])
    assert (got_s, rc_s) == (want_s, wrc_s)

    # file target: start-sorted
    p = tmp_path / "t.txt"
    p.write_bytes(text)
    got_f, rc_f = ours([*args, str(p)])
    want_f, wrc_f = oracle.run([*args, str(p)])
    got_f = got_f.replace(str(p).encode(), b"F")
    want_f = want_f.replace(str(p).encode(), b"F")
    assert (got_f, rc_f) == (want_f, wrc_f)
    assert got_f.splitlines()[0] == b"F:1:abcd"  # sorted order pinned
