"""Search parameters and semantic profiles.

The reference carries all search state in `search_params_t` (krep.h:65-94)
plus a handful of file-scope globals (`only_matching`, `force_no_simd`,
`algo_override`, ... krep.c:116-122). Here everything is folded into one
immutable dataclass, per SURVEY.md §5's note.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field, replace
from typing import Optional, Sequence

MAX_PATTERN_LENGTH = 1024  # krep.c:77 — max pattern bytes and max pattern count


class SimdProfile(enum.Enum):
    """Which reference ISA's *selection semantics* to emulate.

    The reference's observable overlap/count semantics depend on which SIMD
    kernel `select_search_algorithm` (krep.c:1771-1870) picks, which depends
    on the build ISA (Makefile:19-49). The TPU engine always computes the
    full all-starts mask; this profile only controls which advance policy the
    resolution stage applies, so outputs are byte-exact with a given
    reference build. AVX512 matches an x86-64 `make` on this machine.
    """

    AVX512 = "avx512"
    AVX2 = "avx2"
    SSE42 = "sse42"
    NEON = "neon"
    SCALAR = "scalar"  # --no-simd / no SIMD support


class MatchPolicy(enum.Enum):
    """Advance-after-match policy (see ARCHITECTURE.md table)."""

    ALL = "all"                # count every start position (overlapping)
    NONOVERLAP = "nonoverlap"  # greedy left-to-right, advance by pattern_len
    # AVX2/AVX-512 -o: the vector loop finds overlapping matches but hands
    # the final sub-window bytes to Boyer-Moore, whose -o advance is greedy
    # (krep.c:5058-5097). ALL before the window cut, greedy after.
    VECTOR_TAIL32 = "vector_tail32"
    VECTOR_TAIL64 = "vector_tail64"


class Algorithm(enum.Enum):
    """Names mirror get_algorithm_name() (krep.c:1964-1996)."""

    MEMCHR = "memchr"
    MEMCHR_SHORT = "memchr_short"
    BOYER_MOORE = "boyer_moore"
    KMP = "kmp"
    SSE42 = "sse42"
    AVX2 = "avx2"
    AVX512 = "avx512"
    NEON = "neon"
    AHO_CORASICK = "aho_corasick"
    REGEX = "regex"


@dataclass(frozen=True)
class SearchParams:
    """Mirror of search_params_t (krep.h:65-94), plus the reference globals.

    `patterns` are bytes; the reference caps both pattern length and pattern
    count at 1024 (krep.c:77, 2042-2047).
    """

    patterns: tuple[bytes, ...]
    case_sensitive: bool = True
    use_regex: bool = False
    whole_word: bool = False
    # Mode resolution per krep.c:3811-3814:
    #   count_lines_mode   = -c && !-o
    #   count_matches_mode = -c && -o
    #   track_positions    = !(-c && !-o)
    only_matching: bool = False        # -o
    count_mode: bool = False           # -c
    max_count: Optional[int] = None    # -m NUM (None = unlimited, SIZE_MAX)
    algo_override: Optional[str] = None  # --algo {auto,bm,kmp}
    no_simd: bool = False              # --no-simd (krep.c:118)
    use_gitignore: bool = False        # --gitignore (krep.c:120)
    profile: SimdProfile = SimdProfile.AVX512
    # Position ORDER is target-dependent in the reference: real-file
    # searches qsort the merged chunk results by start (krep.c:3020-3023),
    # but search_string — the stdin and -s path — prints matches exactly
    # as the AC walk collected them, i.e. ascending (end, start), with NO
    # final sort (krep.c:2187+). Only observable for multi-pattern literal
    # position queries with overlapping matches.
    sorted_positions: bool = True

    def __post_init__(self):
        pats = tuple(
            p.encode() if isinstance(p, str) else bytes(p) for p in self.patterns
        )
        object.__setattr__(self, "patterns", pats)
        if len(pats) > MAX_PATTERN_LENGTH:
            raise ValueError(f"too many patterns (max {MAX_PATTERN_LENGTH})")
        # NOTE: per-pattern length is NOT validated here — the reference
        # rejects overlong patterns at search entry with a per-target
        # message (krep.c:2313-2320); see engine.search.validate_patterns.

    # --- derived modes (krep.c:3811-3814) ---
    @property
    def count_lines_mode(self) -> bool:
        return self.count_mode and not self.only_matching

    @property
    def count_matches_mode(self) -> bool:
        return self.count_mode and self.only_matching

    @property
    def track_positions(self) -> bool:
        return not self.count_lines_mode

    @property
    def pattern(self) -> bytes:
        return self.patterns[0]

    @property
    def num_patterns(self) -> int:
        return len(self.patterns)

    @property
    def effective_max_count(self) -> int:
        import sys

        return self.max_count if self.max_count is not None else sys.maxsize

    def with_(self, **kw) -> "SearchParams":
        return replace(self, **kw)
