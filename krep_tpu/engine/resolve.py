"""Resolution: dense masks → reference-exact match lists/counts.

The reference repeats a postlude in every kernel (whole-word filter, -c line
dedup, -m early exit, position tracking — SURVEY.md §3.4). Here it is ONE
stage, applied to sparse positions extracted from the device mask. Hot parts
(greedy non-overlap, line-id attribution) are vectorized numpy now and move
to the C runtime extension (krep_tpu/native/) as corpora grow.
"""

from __future__ import annotations

import numpy as np

from ..params import MatchPolicy

try:  # optional C fast path (krep_tpu/native/)
    from ..native import runtime as _native
except Exception:  # pragma: no cover - extension not built
    _native = None


def unpack_mask_host(packed: np.ndarray, n: int) -> np.ndarray:
    """packed uint8 bitmask → sorted positions of set bits."""
    if _native is not None:
        return _native.bits_to_starts(np.asarray(packed, dtype=np.uint8), n)
    bits = np.unpackbits(np.asarray(packed, dtype=np.uint8), bitorder="little")
    return np.flatnonzero(bits[:n])


def greedy_nonoverlap(starts: np.ndarray, m: int) -> np.ndarray:
    """Greedy left-to-right non-overlapping selection from sorted all-starts.

    Equivalent to the advance-by-pattern_len loops in KMP (krep.c:1741),
    BMH -o (krep.c:1371-1374), SSE4.2 default (krep.c:4837-4848).
    """
    if len(starts) == 0:
        return starts
    if _native is not None:
        return _native.greedy_nonoverlap(np.ascontiguousarray(starts, np.int64), m)
    keep = []
    next_ok = -1
    # Python loop fallback; replaced by C for large inputs.
    for s in starts:
        if s >= next_ok:
            keep.append(s)
            next_ok = s + m
    return np.asarray(keep, dtype=starts.dtype)


def memchr_short_o_walk(
    candidates: np.ndarray,
    verified: np.ndarray,
    word_ok: np.ndarray,
    m: int,
) -> np.ndarray:
    """Reproduce memchr_short_search's -o advance quirk (krep.c:4495):
    after EVERY first-byte candidate — matched or failed verification — the
    scan skips pattern_len bytes, except a whole-word rejection which skips
    one byte. This can drop real matches; the reference's observable output
    includes those drops, so we emulate them.

    candidates: sorted positions where the first byte matches (valid starts)
    verified:   bool per candidate — remaining bytes match
    word_ok:    bool per candidate — passes the whole-word filter
    """
    if _native is not None:
        return _native.memchr_short_o_walk(
            np.ascontiguousarray(candidates, np.int64),
            np.ascontiguousarray(verified, np.uint8),
            np.ascontiguousarray(word_ok, np.uint8),
            m,
        )
    kept = []
    pos = 0
    k = len(candidates)
    i = 0
    while i < k:
        c = int(candidates[i])
        if c < pos:
            i += 1
            continue
        if verified[i]:
            if word_ok[i]:
                kept.append(c)
                pos = c + m
            else:
                pos = c + 1
        else:
            pos = c + m
        i += 1
    return np.asarray(kept, dtype=np.int64)


def apply_policy(
    starts: np.ndarray, m: int, policy: MatchPolicy, text_len: int | None = None
) -> np.ndarray:
    if policy is MatchPolicy.ALL:
        return starts
    if policy in (MatchPolicy.VECTOR_TAIL32, MatchPolicy.VECTOR_TAIL64):
        # AVX2/AVX-512 -o semantics: overlapping matches in the vector
        # region, greedy non-overlap (a fresh BMH) in the scalar tail —
        # the tail starts at the last full vector window boundary
        # (krep.c:5051-5097 / 5259-5283).
        assert text_len is not None
        window = 32 if policy is MatchPolicy.VECTOR_TAIL32 else 64
        cut = text_len - (text_len % window)
        head = starts[starts < cut]
        tail = greedy_nonoverlap(starts[starts >= cut], m)
        return np.concatenate([head, tail])
    return greedy_nonoverlap(starts, m)


def truncate_max_count(arr: np.ndarray, max_count: int | None) -> np.ndarray:
    if max_count is None:
        return arr
    return arr[:max_count]


def _fold_np(b: np.ndarray) -> np.ndarray:
    return np.where((b >= 0x41) & (b <= 0x5A), b + 32, b).astype(np.uint8)


def _is_word_np(b: np.ndarray) -> np.ndarray:
    return (
        ((b >= 0x30) & (b <= 0x39))
        | ((b >= 0x41) & (b <= 0x5A))
        | ((b >= 0x61) & (b <= 0x7A))
        | (b == 0x5F)
    )


def attribute_patterns(
    data: np.ndarray,
    anchors: np.ndarray,
    patterns,
    *,
    case_sensitive: bool,
    whole_word: bool,
    anchor: str = "start",
) -> tuple[np.ndarray, np.ndarray]:
    """Which patterns (with multiplicity) match at the given anchor
    positions — the host side of the union-mask / DFA-emission designs.

    anchors are match START positions (anchor="start", fused-union masks) or
    match END positions (anchor="end", AC/DFA emissions). Returns merged
    (starts, ends) arrays including duplicates, whole-word filtered.
    """
    n = data.shape[0]
    t = data if case_sensitive else _fold_np(data)
    all_s, all_e = [], []
    for p in patterns:
        pk = np.frombuffer(p, np.uint8)
        if not case_sensitive:
            pk = _fold_np(pk)
        mk = len(pk)
        if anchor == "start":
            cand = anchors[anchors + mk <= n]
        else:
            s = anchors - mk
            cand = s[s >= 0]
        if len(cand) == 0:
            continue
        # chunk the verification matrix (candidates x pattern_len bytes)
        keep = []
        CH = max(1, (64 << 20) // max(mk, 1))
        for i0 in range(0, len(cand), CH):
            cc = cand[i0 : i0 + CH]
            idx = cc[:, None] + np.arange(mk)
            keep.append(cc[(t[idx] == pk).all(axis=1)])
        cand = np.concatenate(keep)
        if whole_word and len(cand):
            before_ok = np.ones(len(cand), bool)
            nz = cand > 0
            before_ok[nz] = ~_is_word_np(data[cand[nz] - 1])
            after_ok = np.ones(len(cand), bool)
            inr = cand + mk < n
            after_ok[inr] = ~_is_word_np(data[cand[inr] + mk])
            cand = cand[before_ok & after_ok]
        all_s.append(cand)
        all_e.append(cand + mk)
    if not all_s:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(all_s), np.concatenate(all_e)


def ac_order_truncate(
    starts: np.ndarray, ends: np.ndarray, max_count: int | None,
    final_sort: bool = True,
) -> np.ndarray:
    """AC emission-order (-m) truncation, then the final (start, end) sort
    the reference's FILE path applies to merged chunk results (qsort at
    krep.c:3020-3023). final_sort=False keeps AC emission order —
    ascending (end, start), longest-first at equal ends via the
    output-chain walk — which is what search_string (stdin and -s
    targets) prints, as collected, with no sort (krep.c:2187+)."""
    order = np.lexsort((starts, ends))
    starts, ends = starts[order], ends[order]
    if max_count is not None:
        starts, ends = starts[:max_count], ends[:max_count]
    if final_sort:
        order = np.lexsort((ends, starts))
        starts, ends = starts[order], ends[order]
    return np.stack([starts, ends], axis=1).astype(np.int64)


def line_ids(starts: np.ndarray, newline_positions: np.ndarray) -> np.ndarray:
    """0-based line index for each match start (line = # newlines before it).
    Mirrors the binary-search line numbering at krep.c:621-653."""
    return np.searchsorted(newline_positions, starts, side="left")


def newline_positions_host(text: bytes | np.ndarray) -> np.ndarray:
    buf = np.frombuffer(text, dtype=np.uint8) if isinstance(text, (bytes, bytearray, memoryview)) else text
    return np.flatnonzero(buf == 10)
