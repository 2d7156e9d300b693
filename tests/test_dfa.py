"""Dense-DFA multi-pattern path (>32 patterns) vs naive and vs oracle."""

import io
import os
import tempfile

import numpy as np
import pytest

import naive
import oracle
from krep_tpu import SearchParams, search_string, cli
from krep_tpu.ops import ac


def make_patterns(k: int) -> list[bytes]:
    words = (
        b"the fox dog cat run jump over lazy quick brown sher lock hol mes "
        b"wat son ele men tary my dear them read bre athe aaa bb ccc dd"
    ).split()
    pats = []
    i = 0
    while len(pats) < k:
        w = words[i % len(words)]
        suffix = str(i // len(words)).encode() if i >= len(words) else b""
        pats.append(w + suffix)
        i += 1
    return pats


def test_dense_ac_build_matches_naive():
    pats = [b"he", b"she", b"his", b"hers"]
    table, emit = ac.build_dense_ac(pats, True)
    text = b"ushers"
    state = 0
    total = 0
    for c in text:
        state = int(table[state, c])
        total += int(emit[state])
    assert total == 3  # classic ushers result


@pytest.mark.parametrize("k", [40, 64, 80])
def test_dfa_counts_vs_naive(k):
    pats = make_patterns(k)
    text = naive.gen_english(13, 20_000)
    p = SearchParams(patterns=tuple(pats), only_matching=True, count_mode=True)
    got = search_string(p, text).count
    want = sum(len(naive.all_starts(text, q)) for q in pats)
    assert got == want


def test_dfa_positions_vs_naive():
    pats = make_patterns(40)
    text = naive.gen_english(14, 8_000)
    p = SearchParams(patterns=tuple(pats), only_matching=True)
    r = search_string(p, text)
    want = sorted(
        (s, s + len(q)) for q in pats for s in naive.all_starts(text, q)
    )
    assert r.positions.tolist() == [list(x) for x in want]


def test_dfa_line_count_vs_naive():
    pats = make_patterns(40)
    text = naive.gen_english(15, 10_000)
    p = SearchParams(patterns=tuple(pats), count_mode=True)
    got = search_string(p, text).count
    starts = [s for q in pats for s in naive.all_starts(text, q)]
    assert got == naive.matched_lines(text, starts)


def test_dfa_whole_word_and_case():
    pats = make_patterns(40)
    text = naive.gen_english(16, 10_000)
    for cs, ww in [(False, False), (True, True), (False, True)]:
        p = SearchParams(
            patterns=tuple(pats), only_matching=True, count_mode=True,
            case_sensitive=cs, whole_word=ww,
        )
        got = search_string(p, text).count
        want = sum(
            len(naive.all_starts(text, q, case_sensitive=cs, whole_word=ww))
            for q in pats
        )
        assert got == want, (cs, ww)


@pytest.mark.skipif(oracle.ensure_oracle() is None, reason="oracle unavailable")
def test_dfa_cli_parity_via_pattern_file(tmp_path):
    pats = make_patterns(48)
    pf = tmp_path / "patterns.txt"
    pf.write_bytes(b"\n".join(pats) + b"\n")
    text = naive.gen_english(17, 15_000)
    tf = tmp_path / "corpus.txt"
    tf.write_bytes(text)

    for args in (["-c", "-o"], ["-c"], ["-o", "-m", "25"]):
        out = io.BytesIO()
        rc = cli.main([*args, "-f", str(pf), str(tf)], out=out)
        want, wrc = oracle.run([*args, "-f", str(pf), str(tf)])
        got = out.getvalue().replace(str(tf).encode(), b"F")
        want = want.replace(str(tf).encode(), b"F")
        assert got == want, args
        assert rc == wrc
