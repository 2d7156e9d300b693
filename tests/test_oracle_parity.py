"""End-to-end count parity vs the reference binary (built from
/root/reference). These are the golden tests of SURVEY.md §7 step 1: counts
must be byte-exact with krep across modes, overlap corners, and pattern
lengths at every delegation boundary."""

import numpy as np
import pytest

import naive
import oracle
from krep_tpu import SearchParams, search_string

pytestmark = pytest.mark.skipif(
    oracle.ensure_oracle() is None, reason="reference oracle unavailable"
)


def oracle_match_count(text: bytes, args: list[str]) -> int:
    out, rc = oracle.run_on_text(text, ["-c", "-o", *args])
    assert rc in (0, 1)
    return oracle.count_from_output(out)


def oracle_line_count(text: bytes, args: list[str]) -> int:
    out, rc = oracle.run_on_text(text, ["-c", *args])
    assert rc in (0, 1)
    return oracle.count_from_output(out)


CORPora = [naive.gen_english(s, 20_000) for s in range(3)]

# Pattern lengths at every selection/delegation boundary on this machine's
# build (AVX512 profile): 1 / 2-3 / 4-16 / 17-32 / 33-64 / >64.
PATTERNS = [
    b"e",
    b"th",
    b"the",
    b"aaa",
    b"aba",
    b"quick",
    b"Sherlock",
    b"a" * 5,
    b"the quick brown fox jumps",          # 25 → avx2
    b"the quick brown fox jumps over laz",  # 34 → avx512
    b"the quick brown fox jumps over lazy dog Sherlock Holmes watson el",  # 66 → bmh
]


@pytest.mark.parametrize("pat", PATTERNS)
def test_match_count_parity(pat):
    for text in CORPora:
        p = SearchParams(patterns=(pat,), only_matching=True, count_mode=True)
        got = search_string(p, text).count
        want = oracle_match_count(text, [pat.decode()])
        assert got == want, pat


@pytest.mark.parametrize("pat", PATTERNS)
def test_line_count_parity(pat):
    for text in CORPora:
        p = SearchParams(patterns=(pat,), count_mode=True)
        got = search_string(p, text).count
        want = oracle_line_count(text, [pat.decode()])
        assert got == want, pat


@pytest.mark.parametrize("pat", [b"the", b"THE", b"The", b"sherlock"])
def test_case_insensitive_parity(pat):
    for text in CORPora[:2]:
        p = SearchParams(
            patterns=(pat,), case_sensitive=False, only_matching=True, count_mode=True
        )
        got = search_string(p, text).count
        want = oracle_match_count(text, ["-i", pat.decode()])
        assert got == want

        p2 = SearchParams(patterns=(pat,), case_sensitive=False, count_mode=True)
        got2 = search_string(p2, text).count
        want2 = oracle_line_count(text, ["-i", pat.decode()])
        assert got2 == want2


@pytest.mark.parametrize("pat", [b"the", b"fox", b"dog", b"x"])
def test_whole_word_parity(pat):
    for text in CORPora[:2]:
        p = SearchParams(
            patterns=(pat,), whole_word=True, only_matching=True, count_mode=True
        )
        got = search_string(p, text).count
        want = oracle_match_count(text, ["-w", pat.decode()])
        assert got == want


def test_overlap_semantics_pinned():
    """The reference's own pinned overlap table (test_krep.c:443-477)."""
    # auto on this build = sse42 for len 2-3: default NONOVERLAP, -o ALL
    p_def = SearchParams(patterns=(b"aba",), count_mode=True, only_matching=True)
    assert search_string(p_def, b"abababa").count == oracle_match_count(
        b"abababa", ["aba"]
    )
    # --algo bm: default ALL → -c -o … wait, -c -o counts with -o policy
    for algo, pat, text in [
        ("bm", "aba", b"abababa"),
        ("kmp", "aba", b"abababa"),
        ("bm", "aa", b"aaaaa"),
        ("kmp", "aa", b"aaaaa"),
    ]:
        p = SearchParams(
            patterns=(pat.encode(),), count_mode=True, only_matching=True,
            algo_override=algo,
        )
        got = search_string(p, text).count
        want = oracle_match_count(text, ["--algo", algo, pat])
        assert got == want, (algo, pat)


@pytest.mark.parametrize("mc", [0, 1, 2, 3, 5, 1000])
def test_max_count_parity(mc):
    text = CORPora[0]
    p = SearchParams(
        patterns=(b"the",), only_matching=True, count_mode=True, max_count=mc
    )
    got = search_string(p, text).count
    want = oracle_match_count(text, ["-m", str(mc)])
    # oracle needs the pattern arg ordering: -m NUM PATTERN
    out, rc = oracle.run_on_text(text, ["-c", "-o", "-m", str(mc), "the"])
    want = oracle.count_from_output(out)
    assert got == want, mc

    p2 = SearchParams(patterns=(b"the",), count_mode=True, max_count=mc)
    got2 = search_string(p2, text).count
    out2, rc2 = oracle.run_on_text(text, ["-c", "-m", str(mc), "the"])
    want2 = oracle.count_from_output(out2)
    assert got2 == want2, mc


def test_multi_pattern_parity():
    text = CORPora[0]
    pats = ["the", "fox", "Sherlock", "og"]
    args = []
    for q in pats:
        args += ["-e", q]
    p = SearchParams(
        patterns=tuple(q.encode() for q in pats), only_matching=True, count_mode=True
    )
    got = search_string(p, text).count
    out, rc = oracle.run_on_text(text, ["-c", "-o", *args])
    assert got == oracle.count_from_output(out)

    p2 = SearchParams(patterns=tuple(q.encode() for q in pats), count_mode=True)
    got2 = search_string(p2, text).count
    out2, _ = oracle.run_on_text(text, ["-c", *args])
    assert got2 == oracle.count_from_output(out2)


def test_classic_ushers():
    """he/she/his/hers in 'ushers' → 3 (test_multiple_patterns.c:57-104)."""
    p = SearchParams(
        patterns=(b"he", b"she", b"his", b"hers"), only_matching=True, count_mode=True
    )
    assert search_string(p, b"ushers").count == 3


def test_overlapping_pattern_set():
    """a,b,c,ab,bc,abc in 'abc' → 6 (test_multiple_patterns.c:185-228)."""
    p = SearchParams(
        patterns=(b"a", b"b", b"c", b"ab", b"bc", b"abc"),
        only_matching=True,
        count_mode=True,
    )
    assert search_string(p, b"abc").count == 6


def test_newline_pattern_count_simd_divergence():
    """KNOWN_DIVERGENCES #9: the reference's SIMD -c path loses lines when
    overlapping matches of a '\\n'-containing pattern start on different
    lines (non-overlap advancement, krep.c:4835-4846). We count exactly;
    the reference's SCALAR selections agree with us — so the pin is
    (a) byte parity with `--no-simd`, (b) our count equals ground truth,
    and (c) if the auto selection differs at all it only ever UNDERcounts
    (the bug direction)."""
    # '\nb\n' self-overlaps at distance 2: matches at 1,3,5 end lines
    # 0,1,2 — the non-overlap skip from the match at 1 jumps past 3
    text = b"x\nb\nb\nb\nx" + b"ab\n" * 40 + b"\nb\nb\nb\n"
    pat = b"\nb\n"
    starts = [
        i for i in range(len(text) - 2) if text[i : i + 3] == pat
    ]
    lines = {text.count(b"\n", 0, s) for s in starts}
    p = SearchParams(patterns=(pat,), count_mode=True)
    got = search_string(p, text).count
    assert got == len(lines)  # exact ground truth

    out, rc = oracle.run_on_text(
        text, ["-c", "--no-simd", "-e", pat.decode("latin1")]
    )
    assert rc == 0
    assert oracle.count_from_output(out) == got  # scalar reference agrees

    out_auto, _ = oracle.run_on_text(text, ["-c", "-e", pat.decode("latin1")])
    auto = oracle.count_from_output(out_auto)
    assert auto <= got  # SIMD (if selected on this host) only loses lines


def test_multi_newline_pattern_count_ac_divergence():
    """KNOWN_DIVERGENCES #10: the reference AC's -c dedup is a single-value
    memo (last_counted_line_start, aho_corasick.c:392-402), exact only
    while line starts arrive monotonically. AC walks matches in END order;
    a '\\n'-spanning member makes line starts interleave and the memo then
    counts a revisited line AGAIN. We count each matched line exactly
    once; the pin is (a) our count equals ground truth, and (b) the
    reference's AC either agrees or OVERcounts (the bug direction)."""
    # '\nbb' spans a boundary; 'cc' hits later lines between its matches,
    # bouncing the memo off each revisited line
    text = b"aa\nbb cc\nbb cc\nbb\n" * 30
    pats = (b"\nbb", b"cc")
    starts = set()
    for p in pats:
        starts.update(
            i for i in range(len(text) - len(p) + 1)
            if text[i : i + len(p)] == p
        )
    lines = {text.count(b"\n", 0, s) for s in starts}
    p = SearchParams(patterns=pats, count_mode=True)
    got = search_string(p, text).count
    assert got == len(lines)  # exact ground truth

    out, rc = oracle.run_on_text(
        text, ["-c", "-e", pats[0].decode("latin1"), "-e", "cc"]
    )
    assert rc == 0
    ref = oracle.count_from_output(out)
    assert ref >= got  # AC memo (if it revisits) only overcounts

    # members without '\n' can't span a line: memo monotone => byte parity
    out2, rc2 = oracle.run_on_text(text, ["-c", "-e", "bb", "-e", "cc"])
    p2 = SearchParams(patterns=(b"bb", b"cc"), count_mode=True)
    assert search_string(p2, text).count == oracle.count_from_output(out2)


def test_whole_word_rejected_overlap_divergence():
    """KNOWN_DIVERGENCES #11: a -w candidate the reference REJECTS at the
    word-boundary test still consumes pattern_len in its non-overlap
    engines (SIMD krep.c:4835-4848, KMP krep.c:1735-1745), skipping a
    word-bounded match that overlaps it. We filter boundaries BEFORE the
    advance, so only matched spans consume text. Pins: (a) our result is
    ground truth, (b) the reference's scalar/BMH selections agree with us
    byte-for-byte, (c) the auto and kmp selections only ever UNDERcount
    (the bug direction)."""
    # candidate 'a a' at offset 1 is preceded by the word char 'x'->'a';
    # the word-bounded match at offset 3 overlaps it
    text = b"xa a a ax\n" * 3
    pat = "a a"
    p = SearchParams(patterns=(pat.encode(),), whole_word=True,
                     count_mode=True)
    got = search_string(p, text).count
    assert got == 3  # one word-bounded match per repetition

    for extra in (["--no-simd"], ["--algo", "bm"]):
        out, rc = oracle.run_on_text(text, [*extra, "-c", "-w", pat])
        assert rc == 0
        assert oracle.count_from_output(out) == got

    for extra in ([], ["--algo", "kmp"]):
        out, _ = oracle.run_on_text(text, [*extra, "-c", "-w", pat])
        assert oracle.count_from_output(out) <= got


def test_stdin_multiline_default_print_drop_divergence():
    """KNOWN_DIVERGENCES #12: the reference's stdin/-s search_string path
    hands the printer AC END-ordered (unsorted) matches (krep.c:2390-2392
    vs the file path's sort at 3020-3023), and print_matching_items'
    collect loop (krep.c:880-917) silently consumes any match that starts
    on an EARLIER line than the line being emitted — so default-print
    via stdin DROPS a matched line its own -c counts. Pins: (a) our
    stdin default output has exactly the -c matched-line set (ground
    truth, emission order), (b) the reference's stdin -c agrees with our
    line count, (c) the reference's stdin default only ever UNDERcounts
    (the bug direction), (d) on a FILE target (sorted path) the
    reference and we agree byte-for-byte."""
    from clirun import run_cli

    text = b"a dd\nxx ee\n"
    # 'dd\nxx ee' starts on line 1 and ends on line 2; 'xx' both starts
    # and ends on line 2 — AC end-order emits 'xx' FIRST, so the longer
    # match's line-1 start arrives out of order at the printer
    args = ["-e", "dd\nxx ee", "-e", "xx"]

    got, _, rc = run_cli(args, stdin_bytes=text)
    assert rc == 0
    # both matched lines, in the reference's AC emission order
    assert got == b"xx ee\na dd\n"

    out_c, rc_c = oracle.run(["-c", *args], stdin=text)
    assert rc_c == 0
    assert oracle.count_from_output(out_c) == 2  # ref -c counts both

    out_def, rc_def = oracle.run(args, stdin=text)
    assert rc_def == 0
    ref_lines = out_def.split(b"\n")[:-1]
    assert len(ref_lines) <= 2  # the bug only LOSES lines
    if len(ref_lines) < 2:
        # current reference binaries drop line 1 exactly as documented
        assert out_def == b"xx ee\n"

    # file target: the sorted path prints both lines; byte parity holds
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        out_f, rc_f = oracle.run([*args, path])
        assert rc_f == 0
        prefix = path.encode() + b":"
        assert out_f == prefix + b"a dd\n" + prefix + b"xx ee\n"
        got_f, _, rcf2 = run_cli([*args, path])
        assert rcf2 == 0
        assert got_f == out_f
    finally:
        os.unlink(path)


def test_whole_word_repetitive_kmp_via_nosimd_divergence():
    """KNOWN_DIVERGENCES #11 (second engine): --no-simd is NOT a safe
    oracle pin for -w patterns with non-word bytes — auto selection
    routes REPETITIVE length>=4 patterns to KMP even without SIMD
    (krep.c:1834+ via is_repetitive_pattern), and KMP consumes
    pattern_len on a rejected candidate. Pins: (a) our count is ground
    truth, (b) --algo bm agrees byte-for-byte, (c) --no-simd and
    --algo kmp only ever UNDERcount (the bug direction)."""
    # candidate at 0 is word-bounded; candidate at 2 overlaps it. A
    # rejected candidate precedes a valid overlapped one at offset 4:
    # 'xa\na\na\n\n' -> candidate 1 rejected (preceded by 'x'),
    # candidate 3 valid but consumed by KMP's advance
    text = b"xa\na\na\n\nq\n" + b"a\na\n\nw\n" * 2
    pat = "a\na\n"
    W = frozenset(
        b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
    )
    starts = [
        i for i in range(len(text) - 4 + 1) if text[i : i + 4] == b"a\na\n"
    ]
    good = [
        i for i in starts
        if (i == 0 or text[i - 1] not in W)
        and (i + 4 >= len(text) or text[i + 4] not in W)
    ]
    truth = len({text.count(b"\n", 0, i) for i in good})

    p = SearchParams(patterns=(pat.encode(),), whole_word=True,
                     count_mode=True)
    got = search_string(p, text).count
    assert got == truth

    out_bm, rc = oracle.run_on_text(text, ["--algo", "bm", "-w", "-c", pat])
    assert rc == 0
    assert oracle.count_from_output(out_bm) == got

    for extra in (["--no-simd"], ["--algo", "kmp"]):
        out, _ = oracle.run_on_text(text, [*extra, "-w", "-c", pat])
        assert oracle.count_from_output(out) <= got
