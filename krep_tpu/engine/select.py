"""Algorithm + advance-policy selection.

Reproduces the reference's `select_search_algorithm` decision tree
(krep.c:1771-1870) *including* the runtime delegation chains inside the SIMD
kernels (avx512→avx2 at krep.c:5117-5126, avx2→sse42/BMH at krep.c:4883-4896,
sse42→BMH at krep.c:4708-4712), so that the *observable* overlap semantics of
any reference build can be emulated bit-exactly by the TPU engine.

On TPU the scan kernel is always the same dense all-starts mask; only the
resolution policy differs. `Selection.policy(only_matching)` gives the
advance policy the resolution stage must apply (table in ARCHITECTURE.md).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..params import Algorithm, MatchPolicy, SearchParams, SimdProfile

# SIMD_MAX_PATTERN_LEN per ISA (krep.c:99-113)
_SIMD_MAX_LEN = {
    SimdProfile.AVX512: 64,
    SimdProfile.AVX2: 32,
    SimdProfile.SSE42: 16,
    SimdProfile.NEON: 16,
    SimdProfile.SCALAR: 0,
}

# (default_policy, only_matching_policy) per algorithm — see ARCHITECTURE.md.
_POLICY = {
    Algorithm.MEMCHR: (MatchPolicy.ALL, MatchPolicy.ALL),
    Algorithm.MEMCHR_SHORT: (MatchPolicy.ALL, MatchPolicy.NONOVERLAP),
    Algorithm.BOYER_MOORE: (MatchPolicy.ALL, MatchPolicy.NONOVERLAP),
    Algorithm.KMP: (MatchPolicy.NONOVERLAP, MatchPolicy.NONOVERLAP),
    Algorithm.SSE42: (MatchPolicy.NONOVERLAP, MatchPolicy.ALL),
    Algorithm.AVX2: (MatchPolicy.ALL, MatchPolicy.VECTOR_TAIL32),
    Algorithm.AVX512: (MatchPolicy.ALL, MatchPolicy.VECTOR_TAIL64),
    Algorithm.NEON: (MatchPolicy.ALL, MatchPolicy.ALL),
    Algorithm.AHO_CORASICK: (MatchPolicy.ALL, MatchPolicy.ALL),
    Algorithm.REGEX: (MatchPolicy.NONOVERLAP, MatchPolicy.NONOVERLAP),
}


# human names, mirror of get_algorithm_name (krep.c:1964-1996)
_ALGO_NAMES = {
    Algorithm.MEMCHR: "memchr",
    Algorithm.MEMCHR_SHORT: "memchr-short",
    Algorithm.BOYER_MOORE: "Boyer-Moore-Horspool",
    Algorithm.KMP: "Knuth-Morris-Pratt",
    Algorithm.SSE42: "SSE4.2",
    Algorithm.AVX2: "AVX2",
    Algorithm.AVX512: "AVX-512",
    Algorithm.NEON: "NEON",
    Algorithm.AHO_CORASICK: "Aho-Corasick",
    Algorithm.REGEX: "regex",
}


@dataclass(frozen=True)
class Selection:
    algorithm: Algorithm

    def policy(self, only_matching: bool) -> MatchPolicy:
        d, o = _POLICY[self.algorithm]
        return o if only_matching else d

    @property
    def name(self) -> str:
        """Diagnostic name — mirror of get_algorithm_name (krep.c:1964-1996).
        On TPU this names the emulated *semantics*, not the executing kernel
        (which is always the dense scan)."""
        return _ALGO_NAMES[self.algorithm]


def is_repetitive_pattern(pattern: bytes) -> bool:
    """Mirror of is_repetitive_pattern (krep.c:1873-1914)."""
    n = len(pattern)
    if n < 3:
        return False
    repeats = 0
    prev = pattern[0]
    for i in range(1, n):
        if pattern[i] == prev:
            repeats += 1
            if repeats >= n // 2:
                return True
        else:
            repeats = 0
            prev = pattern[i]
    for seq_len in range(2, n // 2 + 1):
        if all(pattern[i] == pattern[i % seq_len] for i in range(seq_len, n)):
            return True
    return False


def _delegate_simd(algo: Algorithm, m: int, case_sensitive: bool) -> Algorithm:
    """Resolve the runtime fallback chain inside each SIMD kernel."""
    if algo is Algorithm.AVX512:
        # krep.c:5113-5126: !cs or len>64 → avx2; len<=32 → avx2
        if not case_sensitive or m > 64 or m <= 32:
            return _delegate_simd(Algorithm.AVX2, m, case_sensitive)
        return Algorithm.AVX512
    if algo is Algorithm.AVX2:
        # krep.c:4883-4896: !cs or len>32 → BMH; len<=16 → sse42
        if not case_sensitive or m > 32:
            return Algorithm.BOYER_MOORE
        if m <= 16:
            return _delegate_simd(Algorithm.SSE42, m, case_sensitive)
        return Algorithm.AVX2
    if algo is Algorithm.SSE42:
        # krep.c:4708-4712: !cs or len>16 → BMH
        if not case_sensitive or m > 16:
            return Algorithm.BOYER_MOORE
        return Algorithm.SSE42
    return algo


def _top_simd(profile: SimdProfile) -> Algorithm | None:
    return {
        SimdProfile.AVX512: Algorithm.AVX512,
        SimdProfile.AVX2: Algorithm.AVX2,
        SimdProfile.SSE42: Algorithm.SSE42,
        SimdProfile.NEON: Algorithm.NEON,
        SimdProfile.SCALAR: None,
    }[profile]


def select_algorithm(params: SearchParams) -> Selection:
    """Mirror of select_search_algorithm (krep.c:1771-1870)."""
    if params.use_regex:
        return Selection(Algorithm.REGEX)
    if params.num_patterns > 1:
        return Selection(Algorithm.AHO_CORASICK)
    if params.algo_override and params.algo_override != "auto":
        if params.algo_override == "bm":
            return Selection(Algorithm.BOYER_MOORE)
        if params.algo_override == "kmp":
            return Selection(Algorithm.KMP)
        # unknown names fall through to auto (krep.c:1786-1793)

    m = len(params.pattern)
    profile = params.profile
    max_simd = _SIMD_MAX_LEN[profile]
    can_simd = (not params.no_simd) and max_simd > 0 and m <= max_simd

    if m == 1:
        return Selection(Algorithm.MEMCHR)
    if m < 4:  # SHORT_PATTERN_THRESH (krep.c:1802)
        if can_simd and params.case_sensitive:
            top = _top_simd(profile)
            if top is Algorithm.NEON:
                return Selection(Algorithm.NEON)
            return Selection(_delegate_simd(top, m, params.case_sensitive))
        return Selection(Algorithm.MEMCHR_SHORT)

    # m >= 4
    if can_simd:
        # The #if-chain at krep.c:1836-1858, per build profile.
        if profile is SimdProfile.AVX512:
            if m <= 64 and params.case_sensitive:
                return Selection(_delegate_simd(Algorithm.AVX512, m, True))
            if m <= 32:  # avx2 branch also compiled in (Makefile:24-31)
                return Selection(
                    _delegate_simd(Algorithm.AVX2, m, params.case_sensitive)
                )
            if m <= 16 and params.case_sensitive:
                return Selection(_delegate_simd(Algorithm.SSE42, m, True))
        elif profile is SimdProfile.AVX2:
            if m <= 32:
                return Selection(
                    _delegate_simd(Algorithm.AVX2, m, params.case_sensitive)
                )
            if m <= 16 and params.case_sensitive:
                return Selection(_delegate_simd(Algorithm.SSE42, m, True))
        elif profile is SimdProfile.SSE42:
            if m <= 16 and params.case_sensitive:
                return Selection(_delegate_simd(Algorithm.SSE42, m, True))
        elif profile is SimdProfile.NEON:
            if params.case_sensitive:
                return Selection(Algorithm.NEON)

    # Scalar fallback (krep.c:1860-1869)
    if m < 8 and is_repetitive_pattern(params.pattern):
        return Selection(Algorithm.KMP)
    return Selection(Algorithm.BOYER_MOORE)
