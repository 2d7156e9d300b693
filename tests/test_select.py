"""Selection-tree parity: algorithm choice and advance policy per profile.

Pins the decision tree of select_search_algorithm (krep.c:1771-1870) with
the delegation chains resolved, for each ISA profile.
"""

import pytest

from krep_tpu.params import Algorithm, MatchPolicy, SearchParams, SimdProfile
from krep_tpu.engine.select import is_repetitive_pattern, select_algorithm


def sel(pat, **kw):
    profile = kw.pop("profile", SimdProfile.AVX512)
    p = SearchParams(patterns=(pat,), profile=profile, **kw)
    return select_algorithm(p).algorithm


def test_regex_and_multi_first():
    assert sel(b"ab", use_regex=True) is Algorithm.REGEX
    p = SearchParams(patterns=(b"a", b"b"))
    assert select_algorithm(p).algorithm is Algorithm.AHO_CORASICK


def test_algo_override():
    assert sel(b"abcd", algo_override="bm") is Algorithm.BOYER_MOORE
    assert sel(b"abcd", algo_override="kmp") is Algorithm.KMP
    assert sel(b"x", algo_override="bogus") is Algorithm.MEMCHR  # falls to auto


def test_len1_memchr_all_profiles():
    for prof in SimdProfile:
        assert sel(b"x", profile=prof) is Algorithm.MEMCHR
        assert sel(b"x", profile=prof, case_sensitive=False) is Algorithm.MEMCHR


def test_short_patterns_avx512_profile():
    # len 2-3 case-sensitive: avx512 → avx2 → sse42 delegation chain
    assert sel(b"ab") is Algorithm.SSE42
    assert sel(b"abc") is Algorithm.SSE42
    # case-insensitive → memchr_short
    assert sel(b"ab", case_sensitive=False) is Algorithm.MEMCHR_SHORT
    # --no-simd → memchr_short
    assert sel(b"ab", no_simd=True) is Algorithm.MEMCHR_SHORT


def test_mid_patterns_avx512_profile():
    assert sel(b"abcd") is Algorithm.SSE42            # ≤16 cs
    assert sel(b"a" * 16) is Algorithm.SSE42
    assert sel(b"abcdefghijklmnopq") is Algorithm.AVX2  # 17..32 cs
    assert sel(b"x" * 32) is Algorithm.AVX2
    assert sel(b"xy" * 20) is Algorithm.AVX512        # 33..64 cs
    assert sel(b"xy" * 32) is Algorithm.AVX512        # 64
    # case-insensitive ≤32 → avx2 internal fallback → BMH
    assert sel(b"abcd", case_sensitive=False) is Algorithm.BOYER_MOORE
    assert sel(b"x" * 32, case_sensitive=False) is Algorithm.BOYER_MOORE


def test_long_patterns_scalar():
    assert sel(b"z" * 65) is Algorithm.BOYER_MOORE
    # repetitive <8 → KMP (only reachable case-insensitively >simd or no_simd)
    assert sel(b"abab", no_simd=True) is Algorithm.KMP
    assert sel(b"aaaa", case_sensitive=False, no_simd=True) is Algorithm.KMP
    assert sel(b"abcd", no_simd=True) is Algorithm.BOYER_MOORE
    # case-insensitive 4..32 goes through avx2→BMH even when repetitive
    assert sel(b"abab", case_sensitive=False) is Algorithm.BOYER_MOORE


def test_neon_profile():
    assert sel(b"ab", profile=SimdProfile.NEON) is Algorithm.NEON
    assert sel(b"abcdef", profile=SimdProfile.NEON) is Algorithm.NEON
    # NEON caps at SIMD_MAX_PATTERN_LEN=16 via can_use_simd
    assert sel(b"x" * 17, profile=SimdProfile.NEON) is Algorithm.BOYER_MOORE
    assert (
        sel(b"abcdef", profile=SimdProfile.NEON, case_sensitive=False)
        is Algorithm.BOYER_MOORE
    )


def test_policies():
    p = SearchParams(patterns=(b"aba",))
    s = select_algorithm(p)  # sse42 on avx512 profile
    assert s.policy(only_matching=False) is MatchPolicy.NONOVERLAP
    assert s.policy(only_matching=True) is MatchPolicy.ALL
    p2 = SearchParams(patterns=(b"aba",), algo_override="bm")
    s2 = select_algorithm(p2)
    assert s2.policy(only_matching=False) is MatchPolicy.ALL
    assert s2.policy(only_matching=True) is MatchPolicy.NONOVERLAP


def test_is_repetitive():
    assert is_repetitive_pattern(b"aaaa")
    assert is_repetitive_pattern(b"abab")
    assert is_repetitive_pattern(b"abaaba")  # period 3
    assert not is_repetitive_pattern(b"abcd")
    assert not is_repetitive_pattern(b"ab")


def test_memchr_short_o_native_vs_numpy_fuzz():
    """The native one-pass memchr_short -o scan (SWAR candidate blocks +
    verify + quirky advance) must match the numpy fallback pipeline
    byte-for-byte across cases, word mode, -m, and NUL-adjacent corners."""
    import numpy as np

    from krep_tpu.engine import search as sm
    from krep_tpu.params import SearchParams

    rng = np.random.default_rng(123)
    alphas = [b"ab", b"aB\n x", b"the quick\nTHE_fox ", bytes([0, 1, 116, 84, 255, 10])]
    checked = 0
    for trial in range(200):
        alpha = np.frombuffer(alphas[trial % len(alphas)], np.uint8)
        text = bytes(rng.choice(alpha, size=int(rng.integers(1, 4000))))
        m = int(rng.integers(2, 4))
        if len(text) > m and rng.random() < 0.8:
            s = int(rng.integers(0, len(text) - m))
            patb = text[s : s + m]
        else:
            patb = bytes(rng.choice(alpha, size=m))
        if b"\x00" in patb or not patb:
            patb = b"ab"[:m].ljust(m, b"x")
        p = SearchParams(
            patterns=(patb,), only_matching=True,
            case_sensitive=bool(rng.random() < 0.5),
            whole_word=bool(rng.random() < 0.5),
            max_count=int(rng.integers(0, 7)) if rng.random() < 0.3 else None,
        )
        rn = sm._memchr_short_o(p, text)
        rp = sm._memchr_short_o(p, text, force_python=True)
        assert rn.count == rp.count, (patb, p)
        assert np.array_equal(rn.positions, rp.positions), (patb, p)
        checked += 1
    assert checked == 200
