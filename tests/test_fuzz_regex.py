"""Differential ERE fuzzing (VERDICT r2 item 2).

The reference's regex surface is large (krep.c:1389-1579, REG_NEWLINE +
leftmost-longest + zero-length advancement + -w re-checks), and our round-2
fast path stacked a static analyzer + device literal prefilter + a native
candidate-ranges loop on top of it. Three independent differential rigs:

  A. Grammar-generated random EREs through the CLI vs the reference binary,
     byte-for-byte (the seq/plain engine path).
  B. The filtered fast path (_search_regex_filtered) vs the plain engine
     (_search_regex_seq) on corpora dense in the generated factors — the
     device literal scan is replaced by an exact bytes.find stand-in so
     hundreds of cases run without per-pattern XLA compiles. Both the
     native C ranges loop and its pure-Python mirror are pitted.
  C. A bounded set of end-to-end CLI cases >= REGEX_FILTER_MIN_BYTES so the
     real device prefilter path is oracle-diffed too.

The ERE generator is factor-biased: most branches contain a word that the
corpus generator plants, so the filter path sees realistic 1-10% candidate
densities instead of zero-hit corpora.
"""

import io
import os
import tempfile

import numpy as np
import pytest

import oracle
from krep_tpu import cli
from krep_tpu.engine import ere_analyze, regex_engine
from krep_tpu.params import SearchParams

pytestmark = pytest.mark.skipif(
    oracle.ensure_oracle() is None, reason="reference oracle unavailable"
)

WORDS = [
    b"the", b"thing", b"sing", b"ring", b"string", b"quick", b"brown",
    b"fox", b"jumps", b"over", b"lazy", b"dog", b"ingest", b"finger",
    b"THE", b"Thing", b"x9y", b"a_b",
]

SAFE_CHARS = b"abcdefgstxyz_ 049"
BRACKETS = [
    b"[abc]", b"[^xy]", b"[a-f]", b"[0-9]", b"[[:digit:]]", b"[[:alpha:]]",
    b"[aeiou]", b"[^aeiou ]", b"[_a-c2-5]", b"[-a]", b"[]a]", b"[a.]",
]
ESCAPES = [b"\\.", b"\\*", b"\\(", b"\\)", b"\\[", b"\\|", b"\\{", b"\\+",
           b"\\w", b"\\s", b"\\b", b"\\<", b"\\>", b"\\$", b"\\^"]


def gen_atom(rng, depth):
    r = rng.random()
    if r < 0.40:
        return WORDS[rng.integers(0, len(WORDS))]
    if r < 0.60:
        return bytes([SAFE_CHARS[rng.integers(0, len(SAFE_CHARS))]])
    if r < 0.70:
        return BRACKETS[rng.integers(0, len(BRACKETS))]
    if r < 0.78:
        return ESCAPES[rng.integers(0, len(ESCAPES))]
    if r < 0.84:
        return b"."
    if depth < 2:
        return b"(" + gen_pattern(rng, depth + 1) + b")"
    return WORDS[rng.integers(0, len(WORDS))]


def gen_quant(rng):
    r = rng.random()
    if r < 0.55:
        return b""
    if r < 0.65:
        return b"?"
    if r < 0.73:
        return b"*"
    if r < 0.81:
        return b"+"
    lo = int(rng.integers(0, 3))
    kind = rng.random()
    if kind < 0.38:
        return b"{%d}" % lo
    if kind < 0.66:
        return b"{%d,}" % lo
    if kind < 0.94:
        return b"{%d,%d}" % (lo, lo + int(rng.integers(0, 3)))
    # chained quantifiers: glibc applies the second brace as another
    # repetition ('a{2}{3}' matches 'aaaaaa') — the analyzer must bail to
    # the exact plain engine on these (round-2 advisor finding)
    hi = int(rng.integers(1, 4))
    return b"{%d}{%d}" % (max(lo, 1), hi)


def gen_branch(rng, depth):
    out = bytearray()
    if rng.random() < 0.12:
        out += b"^"
    n_atoms = int(rng.integers(1, 4))
    for _ in range(n_atoms):
        out += gen_atom(rng, depth) + gen_quant(rng)
    if rng.random() < 0.12:
        out += b"$"
    return bytes(out)


def gen_pattern(rng, depth=0):
    branches = [gen_branch(rng, depth) for _ in range(int(rng.integers(1, 3)))]
    if depth == 0 and rng.random() < 0.5:
        # guarantee a corpus-word branch so factor hits are common
        branches[0] = WORDS[rng.integers(0, len(WORDS))] + gen_quant(rng)
    return b"|".join(branches)


def gen_corpus(rng, lo=2_000, hi=40_000):
    """Lines of planted vocabulary words + noise; high factor density."""
    out = bytearray()
    n = int(rng.integers(lo, hi))
    while len(out) < n:
        k = int(rng.integers(1, 9))
        line = b" ".join(
            WORDS[rng.integers(0, len(WORDS))]
            if rng.random() < 0.6
            else bytes(
                rng.choice(np.frombuffer(SAFE_CHARS + b".,(){}", np.uint8),
                           size=int(rng.integers(1, 7)))
            )
            for _ in range(k)
        )
        out += line + b"\n"
    return bytes(out)


def gen_flags(rng):
    flags = []
    if rng.random() < 0.3:
        flags.append("-i")
    if rng.random() < 0.25:
        flags.append("-w")
    mode = rng.random()
    if mode < 0.3:
        flags.append("-c")
    elif mode < 0.6:
        flags.append("-o")
    elif mode < 0.7:
        flags += ["-c", "-o"]
    if rng.random() < 0.2:
        flags += ["-m", str(int(rng.integers(0, 6)))]
    return flags


def ref_would_hang(pat: bytes, flags, text: bytes = b"", src: bytes | None = None) -> bool:
    """The reference binary INFINITE-LOOPS in default print mode when a
    match starts exactly on a line end: the same-line skip at
    krep.c:867-871 only advances past matches with start < line_end, so a
    match at start == line_end never advances. Two ways to land there:
    a zero-length match at the boundary (`.*`, `-e ''`), or a match OF
    the newline byte itself (`\\s`, `[[:space:]]` — found by the
    randomized soak). Verified: `krep -E '.*' f`, `krep -E -e '' f`,
    `krep -E '\\s' f` all hang; -c/-o terminate. We deliberately
    terminate (KNOWN_DIVERGENCES #7) — the fuzzer must not feed the
    hang."""
    if "-c" in flags or "-o" in flags:
        return False
    if src is None:
        src = b"\\b" + pat + b"\\b" if "-w" in flags else pat
    cflags = regex_engine.REG_EXTENDED | regex_engine.REG_NEWLINE
    if "-i" in flags:
        cflags |= regex_engine.REG_ICASE
    try:
        rx = regex_engine.PosixRegex(src, cflags)
    except regex_engine.RegexError:
        return False  # both sides exit 2; no regexec ever runs
    if rx.matches_empty():
        return True
    # can a match START at a '\n'? (leftmost semantics: the first match in
    # a window beginning with '\n' starts at 0 iff such a match exists).
    # The window carries real corpus bytes after the newline so multi-byte
    # matches like '\s.' or '[[:space:]][a-z]' are caught, not just the
    # 1-byte '\s' case.
    import ctypes as _ct

    sample = b"\n" + (text[:4096] if text else b"") + \
        b"the thing 09 a_b .,(){}xyz \nq"
    buf = _ct.create_string_buffer(sample, len(sample) + 1)
    hit = rx.exec_at(_ct.addressof(buf), 0, len(sample), 0)
    return hit is not None and hit[0] == 0


def run_cli_vs_oracle(text, args):
    with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        out = io.BytesIO()
        rc = cli.main([*args, path], out=out)
        want, wrc = oracle.run([*args, path])
        got_n = out.getvalue().replace(path.encode(), b"F")
        want_n = want.replace(path.encode(), b"F")
        return got_n, rc, want_n, wrc
    finally:
        os.unlink(path)


# ------------------------- A: CLI parity (plain path) ------------------------


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_ere_cli_parity(seed):
    rng = np.random.default_rng(42_000 + seed)
    for case in range(30):
        text = gen_corpus(rng)
        pat = gen_pattern(rng)
        flags = gen_flags(rng)
        if ref_would_hang(pat, flags, text):
            flags.append("-c")  # keep the case, dodge the reference hang
        args = ["-E", *flags, "-e", pat.decode("latin1")]
        got, rc, want, wrc = run_cli_vs_oracle(text, args)
        assert got == want, (seed, case, pat, got[:200], want[:200])
        assert rc == wrc, (seed, case, pat)


def test_ere_cli_parity_corner_patterns():
    """Deterministic corner EREs, incl. ones glibc rejects (both sides must
    then exit 2) and the chained-quantifier family from ADVICE r2."""
    rng = np.random.default_rng(7)
    text = gen_corpus(rng, 4_000, 8_000) + b"aaaaaa {3} a** the\nno trailing"
    pats = [
        b"", b"^", b"$", b"^$", b"()", b"a|", b"|a", b"(|)",
        b"a**", b"a*+", b"a{2}{3}", b"(the){1}{2}", b"a{0}b", b"(a*)*",
        b"x{0,0}y", b"{3}", b"a|{3}",
        b"[]a]", b"[^]a]", b"[a-]", b"[-a]", b"[a-a]",
        b"\\bthe\\b", b"\\<the\\>", b"the\\b", b"\\Bhe",
        b"(^the|fox$)g?", b".*", b".+the.*", b"(){2}", b"th(e|in)g?",
        b"[[:alpha:]]+ing", b"(th|f)(e|ox)", b"the$|^fox",
        b"a{1000}", b"the{0}", b"(the|)x", b"th?e+i*",
        b"[[:alpha:]not a class:]]", b"a{2,1}", b"a{ 2 }", b"a{+2}",
    ]
    for pat in pats:
        for flags in ([], ["-c"], ["-o"], ["-w"], ["-i", "-o"]):
            if ref_would_hang(pat, flags, text):
                continue  # reference infinite-loops (KNOWN_DIVERGENCES)
            args = ["-E", *flags, "-e", pat.decode("latin1")]
            got, rc, want, wrc = run_cli_vs_oracle(text, args)
            assert got == want, (pat, flags, got[:200], want[:200])
            assert rc == wrc, (pat, flags, rc, wrc)


def _multi_case(rng):
    """2-4 -e EREs + flags, with the reference's combined-OR + \\b-wrapped
    source (krep.c:2087-2161) built for the hang dodge."""
    text = gen_corpus(rng)
    k = int(rng.integers(2, 5))
    pats = [gen_pattern(rng) for _ in range(k)]
    flags = gen_flags(rng)
    params = SearchParams(
        patterns=tuple(pats), use_regex=True,
        whole_word="-w" in flags, case_sensitive="-i" not in flags,
    )
    src = regex_engine.build_regex_source(params)
    if ref_would_hang(b"", flags, text, src=src):
        flags.append("-c")
    return text, pats, flags, src


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_ere_multi_pattern_cli_parity(seed):
    """Randomized multi-pattern EREs through the CLI (VERDICT r3 item 7):
    the combined-OR + per-pattern \\b wrapping source construction
    (krep.c:2087-2161) was untested by randomization — single-pattern fuzz
    can't see grouping/precedence bugs in the combiner (e.g. 'a|b' + '-w'
    must become (\\ba|b\\b) per PATTERN, not per branch)."""
    rng = np.random.default_rng(52_000 + seed)
    for case in range(25):
        text, pats, flags, _ = _multi_case(rng)
        args = ["-E", *flags]
        for p in pats:
            args += ["-e", p.decode("latin1")]
        got, rc, want, wrc = run_cli_vs_oracle(text, args)
        assert got == want, (seed, case, pats, got[:200], want[:200])
        assert rc == wrc, (seed, case, pats)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_ere_multi_pattern_filtered_vs_plain(seed, monkeypatch):
    """The factor prefilter over COMBINED multi-pattern sources vs the plain
    engine — the analyzer must derive sound factors across the ORed
    branches or decline; silently wrong factors would drop matches."""
    monkeypatch.setattr(
        regex_engine, "_union_literal_starts",
        lambda arr, lits, case_sensitive: exact_union_starts(
            arr, lits, case_sensitive
        ),
    )
    rng = np.random.default_rng(62_000 + seed)
    exercised = 0
    for case in range(50):
        text, pats, flags, src = _multi_case(rng)
        params = params_from_flags(pats[0], flags).with_(patterns=tuple(pats))
        analysis = ere_analyze.analyze(regex_engine.build_regex_source(params))
        if analysis is None or not analysis.newline_safe or not analysis.literals:
            continue
        try:
            r_seq = regex_engine._search_regex_seq(params, text)
        except regex_engine.RegexError:
            with pytest.raises(regex_engine.RegexError):
                regex_engine._search_regex_filtered(
                    params, text, analysis.literals
                )
            continue
        for force_python in (False, True):
            r_f = regex_engine._search_regex_filtered(
                params, text, analysis.literals, force_python=force_python
            )
            if r_f is None:
                break
            exercised += 1
            ctx = (seed, case, pats, flags, force_python)
            assert r_f.count == r_seq.count, ctx
            assert np.array_equal(r_f.positions, r_seq.positions), ctx
    assert exercised >= 10, exercised


# ------------------ B: filtered fast path vs plain engine -------------------


def exact_union_starts(arr, literals, case_sensitive):
    """bytes.find reference implementation of _union_literal_starts'
    contract: every start of every literal occurrence, case-folded when
    insensitive (ASCII tolower, like the reference's lower_table)."""
    data = arr.tobytes()
    hay = data if case_sensitive else data.lower()
    hits = set()
    for lit in literals:
        needle = lit if case_sensitive else lit.lower()
        at = hay.find(needle)
        while at != -1:
            hits.add(at)
            at = hay.find(needle, at + 1)
    return np.array(sorted(hits), np.int64)


def params_from_flags(pat, flags):
    return SearchParams(
        patterns=(pat,),
        use_regex=True,
        case_sensitive="-i" not in flags,
        whole_word="-w" in flags,
        count_mode="-c" in flags,
        only_matching="-o" in flags,
        max_count=int(flags[flags.index("-m") + 1]) if "-m" in flags else None,
    )


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_filtered_path_vs_plain(seed, monkeypatch):
    """The whole filter stack (analyzer factors -> union starts -> candidate
    line ranges -> native AND python ranges loops) must agree with the plain
    glibc loop for every generated ERE whose analysis admits filtering."""
    monkeypatch.setattr(
        regex_engine, "_union_literal_starts",
        lambda arr, lits, case_sensitive: exact_union_starts(
            arr, lits, case_sensitive
        ),
    )
    rng = np.random.default_rng(91_000 + seed)
    exercised = 0
    for case in range(60):
        text = gen_corpus(rng)
        pat = gen_pattern(rng)
        flags = gen_flags(rng)
        params = params_from_flags(pat, flags)
        src = regex_engine.build_regex_source(params)
        analysis = ere_analyze.analyze(src)
        if analysis is None or not analysis.newline_safe or not analysis.literals:
            continue
        try:
            r_seq = regex_engine._search_regex_seq(params, text)
        except regex_engine.RegexError:
            # compile error must surface identically on the filtered path
            with pytest.raises(regex_engine.RegexError):
                regex_engine._search_regex_filtered(
                    params, text, analysis.literals
                )
            continue
        for force_python in (False, True):
            r_f = regex_engine._search_regex_filtered(
                params, text, analysis.literals, force_python=force_python
            )
            if r_f is None:
                break  # dense corpus: filter declined (allowed)
            exercised += 1
            ctx = (seed, case, pat, flags, force_python)
            assert r_f.count == r_seq.count, ctx
            assert np.array_equal(r_f.positions, r_seq.positions), ctx
    # the generator must actually hit the fast path most of the time,
    # otherwise this test silently stops testing anything
    assert exercised >= 30, exercised


def test_filtered_path_factor_soundness_fuzz(monkeypatch):
    """Adversarial analyzer check in isolation: for every generated ERE that
    analyze() claims has required factors, every actual glibc match must
    contain one of those factors — otherwise the filter loses matches."""
    rng = np.random.default_rng(555)
    checked = 0
    for _ in range(250):
        pat = gen_pattern(rng)
        analysis = ere_analyze.analyze(pat)
        if analysis is None or not analysis.literals:
            continue
        text = gen_corpus(rng, 1_500, 6_000)
        params = SearchParams(patterns=(pat,), use_regex=True,
                              only_matching=True)
        try:
            r = regex_engine._search_regex_seq(params, text)
        except regex_engine.RegexError:
            continue
        lits = [l.lower() for l in analysis.literals]
        for s, e in r.positions.tolist():
            m = text[s:e].lower()
            assert any(l in m for l in lits), (pat, text[s:e],
                                               analysis.literals)
            checked += 1
    assert checked >= 100, checked


# ----------------- C: end-to-end device filter path (bounded) ---------------


def test_ere_device_filter_cli_parity():
    """A few >=1MiB cases through the REAL device prefilter (bounded literal
    sets to bound XLA compiles), oracle-diffed byte-for-byte."""
    rng = np.random.default_rng(31337)
    base = gen_corpus(rng, 300_000, 300_001)
    text = base * (regex_engine.REGEX_FILTER_MIN_BYTES // len(base) + 2)
    cases = [
        ["-c", "-e", "[[:alpha:]]*ingest"],
        ["-o", "-m", "40", "-e", "str(i|o)ng"],
        ["-c", "-w", "-e", "fox(es)?"],
    ]
    for flags in cases:
        args = ["-E", *flags]
        got, rc, want, wrc = run_cli_vs_oracle(text, args)
        assert got == want, (flags, got[:200], want[:200])
        assert rc == wrc, flags
