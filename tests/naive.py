"""Naive pure-Python reference implementations for kernel-level asserts."""

from __future__ import annotations

import numpy as np


def fold(b: bytes) -> bytes:
    return bytes(c + 32 if 0x41 <= c <= 0x5A else c for c in b)


def is_word_char(c: int) -> bool:
    return (
        0x30 <= c <= 0x39 or 0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A or c == 0x5F
    )


def all_starts(
    text: bytes, pattern: bytes, case_sensitive=True, whole_word=False
) -> list[int]:
    n, m = len(text), len(pattern)
    if m == 0 or n < m:
        return []
    t = text if case_sensitive else fold(text)
    p = pattern if case_sensitive else fold(pattern)
    out = []
    for i in range(n - m + 1):
        if t[i : i + m] != p:
            continue
        if whole_word:
            if i > 0 and is_word_char(text[i - 1]):
                continue
            if i + m < n and is_word_char(text[i + m]):
                continue
        out.append(i)
    return out


def greedy_nonoverlap(starts: list[int], m: int) -> list[int]:
    out, nxt = [], -1
    for s in starts:
        if s >= nxt:
            out.append(s)
            nxt = s + m
    return out


def matched_lines(text: bytes, starts: list[int]) -> int:
    nl = np.flatnonzero(np.frombuffer(text, np.uint8) == 10)
    ids = {int(np.searchsorted(nl, s, side="left")) for s in starts}
    return len(ids)


def gen_corpus(seed: int, size: int, alphabet: bytes = b"abcdef \nthe quick") -> bytes:
    rng = np.random.default_rng(seed)
    arr = rng.choice(np.frombuffer(alphabet, np.uint8), size=size)
    return arr.tobytes()


def gen_english(seed: int, approx_size: int) -> bytes:
    """English-ish corpus with lines, for oracle parity tests."""
    words = (
        b"the quick brown fox jumps over lazy dog Sherlock Holmes watson "
        b"elementary my dear theme thread breathe THE The tHe aaa aaaa abab "
        b"ababab hello world_var foo_bar 42 x"
    ).split()
    rng = np.random.default_rng(seed)
    parts, total = [], 0
    while total < approx_size:
        k = int(rng.integers(3, 12))
        line = b" ".join(words[i] for i in rng.integers(0, len(words), k))
        parts.append(line)
        total += len(line) + 1
    return b"\n".join(parts) + b"\n"
