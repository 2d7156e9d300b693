"""Single-pattern literal scan — pure-XLA reference path.

Computes the *all-starts* match mask: M[i] is True iff
`text[i : i+m] == pattern` (after optional ASCII case folding), optionally
filtered by whole-word boundaries. This one dense primitive subsumes the
reference's memchr / memchr_short / BMH / KMP / SSE4.2 / AVX2 / AVX-512 /
NEON kernels (krep.c:1210-1385, 3891-5287): their differing *advance
policies* are applied later by the resolution stage, never by the scanner.

Everything here is shape-static and jit-cached per (pattern_len, flags,
padded_len); true text length rides in as a dynamic scalar so one compile
serves a whole bucket of lengths.

The Pallas tiled kernel in ops/pallas_scan.py is the performance path; this
module is the semantics oracle it is tested against, and the fallback on
backends without Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEWLINE = 10


def fold_bytes_host(b: bytes) -> bytes:
    """ASCII lower-fold, matching the reference's C-locale lower_table
    (krep.c:124-134)."""
    return bytes(c + 32 if 0x41 <= c <= 0x5A else c for c in b)


def _fold(x: jax.Array) -> jax.Array:
    return jnp.where((x >= 0x41) & (x <= 0x5A), x + 32, x)


def _is_word_char(x: jax.Array) -> jax.Array:
    """alnum or '_' — mirror of is_word_char (krep.h:298-305)."""
    return (
        ((x >= 0x30) & (x <= 0x39))
        | ((x >= 0x41) & (x <= 0x5A))
        | ((x >= 0x61) & (x <= 0x7A))
        | (x == 0x5F)
    )


def all_starts_mask(
    text: jax.Array,
    pattern: bytes,
    *,
    case_sensitive: bool = True,
    whole_word: bool = False,
    true_len: jax.Array | int | None = None,
) -> jax.Array:
    """Dense all-starts mask over a uint8 text array.

    `text` may be padded; `true_len` is the real byte count (defaults to
    text.shape[0]). Padding bytes never produce valid starts because starts
    beyond true_len - m are masked off.
    """
    n = text.shape[0]
    m = len(pattern)
    if true_len is None:
        true_len = n
    if m == 0:
        return jnp.zeros((n,), dtype=jnp.bool_)

    pat = pattern if case_sensitive else fold_bytes_host(pattern)
    t = text if case_sensitive else _fold(text)

    # t padded by m so every shifted slice is in bounds.
    tp = jnp.pad(t, (0, m))
    acc = tp[0:n] == np.uint8(pat[0])
    for j in range(1, m):
        acc = acc & (jax.lax.dynamic_slice_in_dim(tp, j, n) == np.uint8(pat[j]))

    idx = jnp.arange(n, dtype=jnp.int32)
    acc = acc & (idx <= true_len - m)

    if whole_word:
        # is_whole_word_match (krep.h:307-319): char before start and char
        # after end must be non-word (text edges count as boundaries).
        w = _is_word_char(t)
        wp = jnp.pad(w, (1, m))  # wp[i] = w[i-1]
        before_ok = ~wp[0:n]
        after = jax.lax.dynamic_slice_in_dim(jnp.pad(w, (0, m + 1)), m, n)
        # char at true_len.. is padding 0 → non-word, so edge is handled.
        after_ok = ~after
        acc = acc & before_ok & after_ok

    return acc


def first_in_line_mask(mask: jax.Array, text: jax.Array) -> jax.Array:
    """Bool mask of matches that are the FIRST match in their line — the
    "-c" dedup event (find_line_start dedup, krep.c:1331-1351): a match at
    i is first-in-line iff no earlier match sits at or after the current
    line's start."""
    # int32 offsets: single-array texts are capped below 2 GiB; larger inputs
    # go through the sharded path in krep_tpu/parallel/.
    n = text.shape[0]
    it = jnp.int32
    idx = jnp.arange(n, dtype=it)

    # line_start[i] = 1 + position of last '\n' strictly before i (0 if none)
    nl = text == NEWLINE
    nl_mark = jnp.where(nl, idx + 1, 0)
    line_start = jnp.concatenate(
        [jnp.zeros((1,), it), jax.lax.cummax(nl_mark)[:-1]]
    )

    # last_match_before[i] = (position+1) of last match strictly before i
    m_mark = jnp.where(mask, idx + 1, 0)
    last_match_before = jnp.concatenate(
        [jnp.zeros((1,), it), jax.lax.cummax(m_mark)[:-1]]
    )

    return mask & (last_match_before <= line_start)


def matched_line_count(mask: jax.Array, text: jax.Array) -> jax.Array:
    """Number of distinct lines containing ≥1 match start (see
    first_in_line_mask)."""
    return jnp.sum(first_in_line_mask(mask, text).astype(jnp.int32))


def shard_line_stats(mask: jax.Array, text: jax.Array):
    """Per-shard line-accounting stats for exact cross-shard merging.

    Returns (local_first_in_line_count, lead, trail, any_match, has_nl):
      lead  — ≥1 match in the leading segment (before the first in-shard \\n)
      trail — ≥1 match strictly after the last in-shard \\n
    The combiner in krep_tpu/parallel/mesh.py uses these to count lines
    spanning shard boundaries exactly once — the reference's acknowledged
    boundary caveat (krep.c:2952) fixed while preserving 1-thread parity.
    """
    n = text.shape[0]
    it = jnp.int32
    idx = jnp.arange(n, dtype=it)

    nl = text == NEWLINE
    nl_mark = jnp.where(nl, idx + 1, 0)
    line_start = jnp.concatenate([jnp.zeros((1,), it), jax.lax.cummax(nl_mark)[:-1]])
    m_mark = jnp.where(mask, idx + 1, 0)
    last_match_before = jnp.concatenate(
        [jnp.zeros((1,), it), jax.lax.cummax(m_mark)[:-1]]
    )
    first_in_line = mask & (last_match_before <= line_start)
    count = jnp.sum(first_in_line.astype(jnp.int32))

    m_total = jnp.max(m_mark)
    nl_total = jnp.max(nl_mark)
    any_match = m_total > 0
    has_nl = nl_total > 0
    lead = jnp.any(mask & (line_start == 0))
    trail = any_match & (m_total > nl_total)
    return count, lead, trail, any_match, has_nl


_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[65:91] += 32


def _is_word_np(b: np.ndarray) -> np.ndarray:
    return (
        ((b >= 0x30) & (b <= 0x39))
        | ((b >= 0x41) & (b <= 0x5A))
        | ((b >= 0x61) & (b <= 0x7A))
        | (b == 0x5F)
    )


def scan_shard_host(
    data: np.ndarray,
    true_len: int,
    prev_word: int,
    start_limit: int,
    *,
    pattern: bytes,
    case_sensitive: bool = True,
    whole_word: bool = False,
    want_mask: bool = False,
):
    """Host (numpy) twin of pallas_swar.scan_shard for the slab loop on
    non-SWAR backends (the reference's chunker works in any build,
    krep.c:2816-2829; so must ours). Vectorized C-speed numpy beats
    XLA:CPU's scalar-loop lowerings by ~100x here, and skips the staging
    copy entirely. Match STARTS and newline accounting are bounded to
    [0, start_limit) — the owned region — while matches may extend into
    the halo up to true_len; prev_word is the is-word-char flag of the
    byte before the slab for -w continuity.

    Returns (count, first_in_line, trail, lead, has_nl, mask_u8) in
    scan_shard's order (mask_u8 has one byte per slab position)."""
    data = np.asarray(data)
    n = data.shape[0]
    m = len(pattern)
    empty_mask = np.zeros(n if want_mask else 128, np.uint8)
    if m == 0 or true_len < m or start_limit <= 0:
        has_nl = bool((data[:start_limit] == NEWLINE).any())
        return 0, 0, False, False, has_nl, empty_mask

    t = data if case_sensitive else _LOWER_LUT[data]
    pat = np.frombuffer(
        pattern if case_sensitive else fold_bytes_host(pattern), np.uint8
    )
    lim = min(start_limit, true_len - m + 1)
    acc = t[:lim] == pat[0]
    for j in range(1, m):
        acc &= t[j : lim + j] == pat[j]

    if whole_word:
        w_before = np.empty(lim, bool)
        w_before[0] = bool(prev_word)
        if lim > 1:
            w_before[1:] = _is_word_np(t[: lim - 1])
        after = np.zeros(lim, bool)
        hi = min(lim, n - m)  # starts whose after-byte exists in the slab
        if hi > 0:
            after[:hi] = _is_word_np(t[m : m + hi])
        acc &= ~w_before & ~after

    starts = np.flatnonzero(acc)
    count = len(starts)
    nlpos = np.flatnonzero(data[:start_limit] == NEWLINE)
    has_nl = len(nlpos) > 0
    if count:
        li = np.searchsorted(nlpos, starts, side="left")
        fcount = len(np.unique(li))
        lead = bool(li[0] == 0)
        trail = bool(starts[-1] > (nlpos[-1] if has_nl else -1))
    else:
        fcount, lead, trail = 0, False, False
    if want_mask:
        mask = np.zeros(n, np.uint8)
        mask[starts] = 1
    else:
        mask = empty_mask
    return count, fcount, trail, lead, has_nl, mask


def pack_mask(mask: jax.Array) -> jax.Array:
    """Bit-pack a bool mask to uint8, little-endian within each byte, for a
    cheap device→host transfer (the analogue of the per-thread
    match_result_t arrays, krep.h:49-60)."""
    n = mask.shape[0]
    pad = (-n) % 8
    mb = jnp.pad(mask, (0, pad)).reshape(-1, 8).astype(jnp.uint8)
    weights = (2 ** np.arange(8, dtype=np.uint8)).reshape(1, 8)
    return jnp.sum(mb * weights, axis=1).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("pattern", "case_sensitive", "whole_word", "want_mask", "mask_kind"),
)
def scan_literal(
    text: jax.Array,
    true_len: jax.Array,
    *,
    pattern: bytes,
    case_sensitive: bool = True,
    whole_word: bool = False,
    want_mask: bool = True,
    mask_kind: str = "starts",
):
    """One fused scan: returns (match_count, matched_line_count, mask_u8).

    mask_u8 is one byte per text position; a (128,) zero placeholder when
    want_mask=False. mask_kind: "starts" flags every match start;
    "first_line" flags only first-in-line matches (the -c dedup events) —
    used by batched per-file line counting.
    """
    mask = all_starts_mask(
        text,
        pattern,
        case_sensitive=case_sensitive,
        whole_word=whole_word,
        true_len=true_len,
    )
    count = jnp.sum(mask.astype(jnp.int32))
    fil = first_in_line_mask(mask, text)
    lines = jnp.sum(fil.astype(jnp.int32))
    if want_mask:
        out_mask = (fil if mask_kind == "first_line" else mask).astype(jnp.uint8)
    else:
        out_mask = jnp.zeros((128,), dtype=jnp.uint8)
    return count, lines, out_mask


def unpack_mask_host(packed: np.ndarray, n: int) -> np.ndarray:
    """Host-side: packed uint8 → positions of set bits (sorted)."""
    bits = np.unpackbits(np.asarray(packed, dtype=np.uint8), bitorder="little")
    return np.flatnonzero(bits[:n])
