"""POSIX ERE engine — binds the host libc regcomp/regexec via ctypes.

Leftmost-longest + REG_NEWLINE semantics (what `krep -E` produces via glibc,
krep.c:1389-1579) cannot be reproduced by Python's leftmost-first `re`; we
call the exact same libc engine the reference does, and mirror its search
loop byte-for-byte:

  * multi-pattern: combined into one ERE "(p1)|(p2)|..." — each wrapped
    "(\\bp\\b)" under -w; a single -w pattern becomes "\\bp\\b" bare
    (krep.c:2087-2161)
  * compile flags REG_EXTENDED | REG_NEWLINE [| REG_ICASE]
  * REG_STARTEND windowed exec; REG_NOTBOL unless at text start or just
    after '\\n' (krep.c:1432-1434)
  * zero-length match advances by one byte (krep.c:1539-1543)
  * empty text matches once if the regex accepts "" (krep.c:1402-1416)
  * -w double-checks is_whole_word_match and advances so+1 on failure
  * -c dedups by line with skip-to-next-line; -m breaks at max_count
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ..params import SearchParams

REG_EXTENDED = 1
REG_ICASE = 2
REG_NEWLINE = 4
REG_NOTBOL = 1
REG_NOTEOL = 2
REG_STARTEND = 4
REG_NOMATCH = 1

_libc = ctypes.CDLL(None, use_errno=True)


class _regmatch_t(ctypes.Structure):
    _fields_ = [("rm_so", ctypes.c_int), ("rm_eo", ctypes.c_int)]  # glibc regoff_t == int


class RegexError(ValueError):
    pass


class PosixRegex:
    """A compiled glibc regex (opaque regex_t buffer)."""

    def __init__(self, pattern: bytes, cflags: int):
        self._preg = ctypes.create_string_buffer(512)  # sizeof(regex_t)=64 on glibc
        rc = _libc.regcomp(self._preg, ctypes.c_char_p(pattern), cflags)
        if rc != 0:
            buf = ctypes.create_string_buffer(256)
            _libc.regerror(rc, self._preg, buf, 256)
            raise RegexError(f"Regex compilation error: {buf.value.decode()}")
        self._alive = True

    def exec_at(self, base_addr: int, offset: int, rem: int, eflags: int):
        """regexec over [offset, offset+rem) of the NUL-terminated buffer at
        base_addr, REG_STARTEND windowed. Returns (so, eo) rel. offset or None."""
        pm = _regmatch_t(0, rem)
        rc = _libc.regexec(
            self._preg,
            ctypes.c_char_p(base_addr + offset),
            1,
            ctypes.byref(pm),
            eflags | REG_STARTEND,
        )
        if rc == REG_NOMATCH:
            return None
        if rc != 0:
            buf = ctypes.create_string_buffer(256)
            _libc.regerror(rc, self._preg, buf, 256)
            raise RegexError(f"Regex execution error: {buf.value.decode()}")
        if pm.rm_so == -1 or pm.rm_eo == -1:
            return None
        return pm.rm_so, pm.rm_eo

    def matches_empty(self) -> bool:
        pm = _regmatch_t(0, 0)
        return _libc.regexec(self._preg, b"", 1, ctypes.byref(pm), 0) == 0

    def __del__(self):
        if getattr(self, "_alive", False):
            _libc.regfree(self._preg)


def build_regex_source(params: SearchParams) -> bytes:
    """Combined-OR + \\b wrapping, mirroring krep.c:2087-2161."""
    pats = params.patterns
    if len(pats) > 1:
        if params.whole_word:
            return b"|".join(b"(\\b" + p + b"\\b)" for p in pats)
        return b"|".join(b"(" + p + b")" for p in pats)
    if params.whole_word:
        return b"\\b" + pats[0] + b"\\b"
    return pats[0]


def _is_word_byte(c: int) -> bool:
    return (
        0x30 <= c <= 0x39 or 0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A or c == 0x5F
    )


PARALLEL_MIN_BYTES = 8 << 20  # below this, fork overhead dominates


def _worker_chunk(args):
    """Run the sequential loop over one line-aligned chunk. Executed in a
    forked worker; `_G` holds (data, params) via copy-on-write.
    drop_end on every chunk but the last: a zero-length match exactly at
    the chunk end (e.g. '^x*' after the trailing newline) belongs to the
    next chunk, which re-finds it at its own offset 0 — without this,
    every boundary double-counts (both the -o total and the -c line)."""
    lo, hi = args
    data, params = _G
    r = _search_regex_seq(params, data[lo:hi], drop_end=hi < len(data))
    return r.count, (r.positions + lo).tolist()


_G = None


def _parallel_chunks(n: int, data: bytes, workers: int):
    """Line-aligned chunk ranges: since REG_NEWLINE regexes without a
    literal newline byte cannot match across '\\n', cutting at line
    boundaries is exact (unlike the reference's overlap-less thread chunks,
    which silently miss boundary matches — krep.c:2837-2846)."""
    target = max(n // workers, 1 << 20)
    ranges = []
    lo = 0
    while lo < n:
        hi = min(lo + target, n)
        if hi < n:
            nl = data.find(b"\n", hi)
            hi = n if nl == -1 else nl + 1
        ranges.append((lo, hi))
        lo = hi
    return ranges


# Below this size the device round-trip costs more than scanning host-side.
REGEX_FILTER_MIN_BYTES = int(
    os.environ.get("KREP_TPU_REGEX_FILTER_MIN", 1 << 20)
)


def _strict() -> bool:
    """KREP_TPU_STRICT=1 turns fast-path fallbacks into hard failures so a
    broken filter/parallel path can never hide behind the plain engine —
    the test suite runs with it on."""
    return os.environ.get("KREP_TPU_STRICT", "") == "1"


def search_regex(params: SearchParams, text,
                 threads: int | None = None) -> "SearchResult":
    from . import ere_analyze

    if isinstance(text, np.ndarray):
        data = text.tobytes()
    else:
        data = bytes(text)
    n = len(data)

    pattern_src = build_regex_source(params)
    # Static ERE analysis: line-level filtering and line-aligned chunking
    # are exact iff no match can contain '\n' (REG_NEWLINE: '.' and negated
    # brackets never match it; positive brackets/classes and GNU escapes
    # can — ere_analyze tracks all of it, conservatively).
    analysis = ere_analyze.analyze(pattern_src)
    line_safe = analysis is not None and analysis.newline_safe

    if line_safe and analysis.literals and n >= REGEX_FILTER_MIN_BYTES:
        # TPU prefilter: every match must contain one of the required
        # literal factors; the device finds those lines at SWAR scan speed
        # and the exact glibc loop visits only them.
        try:
            r = _search_regex_filtered(params, data, analysis.literals)
            if r is not None:
                return r
        except RegexError:
            raise  # glibc compile errors surface identically on every path
        except Exception:
            if _strict():
                raise
            # device/backend failure only: the exact plain path still answers

    can_parallel = (
        n >= PARALLEL_MIN_BYTES
        and line_safe
        and os.cpu_count() and os.cpu_count() > 1
        and hasattr(os, "fork")
        and threads != 1
    )
    if can_parallel:
        try:
            return _search_regex_parallel(params, data, threads)
        except RegexError:
            raise
        except Exception:
            if _strict():
                raise
            # pool/fork failure only: sequential still answers
    return _search_regex_seq(params, data)


def _union_literal_starts(
    arr: np.ndarray, literals, case_sensitive: bool
) -> np.ndarray:
    """Device scan for the union of literal-factor occurrences: sharded
    across the mesh when available, slabbed single-chip otherwise."""
    import jax

    from ..ops import dispatch

    n = arr.shape[0]
    literals = tuple(literals)
    from ..parallel.mesh import safe_device_count

    if safe_device_count() > 1 and n >= (1 << 16):
        from ..parallel import mesh

        _, _, starts = mesh.sharded_scan(
            arr, literals, case_sensitive=case_sensitive,
            whole_word=False, want_mask=True,
        )
        return starts

    from .search import SLAB_BYTES
    from ..ops import multi as multi_mod

    maxlen = max(len(l) for l in literals)
    parts = []
    pos = 0
    while pos < n:
        owned = min(SLAB_BYTES, n - pos)
        slab = arr[pos : min(pos + owned + maxlen - 1, n)]
        staged = dispatch.stage(slab)
        if dispatch.backend_name() == "swar":
            from ..ops import pallas_swar

            # count-only first: skips the mask write/read-back entirely on
            # hit-free slabs (the common case for a selective factor)
            cnt, _, _ = pallas_swar.scan_multi(
                staged.u32, staged.true_len, patterns=literals,
                case_sensitive=case_sensitive, whole_word=False,
                want_mask=False, want_lines=False,
            )
            if int(cnt) == 0:
                cs = np.zeros(0, np.int64)
            else:
                _, _, mask = pallas_swar.scan_multi(
                    staged.u32, staged.true_len, patterns=literals,
                    case_sensitive=case_sensitive, whole_word=False,
                    want_mask=True, want_lines=False,
                )
                cs = dispatch.starts_from_device_mask(mask, len(slab))
        else:
            _, _, masks = multi_mod.scan_multi(
                staged.u8, staged.true_len, patterns=literals,
                case_sensitive=case_sensitive, whole_word=False,
                want_masks=True,
            )
            u = np.zeros(len(slab), bool)
            for pk in masks:
                u |= np.asarray(pk)[: len(slab)].astype(bool)
            cs = np.flatnonzero(u)
        cs = np.asarray(cs, np.int64)
        cs = cs[cs < owned]
        parts.append(cs + pos)
        pos += owned
    return np.concatenate(parts) if parts else np.zeros(0, np.int64)


def _candidate_line_ranges(arr: np.ndarray, starts: np.ndarray,
                           force_python: bool = False):
    """Distinct (line_start, line_end) ranges containing the given
    positions; line_end excludes the '\\n'."""
    n = arr.shape[0]
    try:
        from ..native import runtime as _nat
    except Exception:
        _nat = None
    if force_python:
        _nat = None
    if _nat is not None:
        # memrchr/memchr per candidate line — O(candidate-line bytes)
        # instead of a full-text newline scan + per-start binary search
        return _nat.line_ranges(arr, starts)
    nl = np.flatnonzero(arr == 10)
    li = np.unique(np.searchsorted(nl, starts, side="left"))
    ls = np.zeros(len(li), np.int64)
    p = li > 0
    ls[p] = nl[li[p] - 1] + 1
    le = np.full(len(li), n, np.int64)
    inb = li < len(nl)
    le[inb] = nl[li[inb]]
    return np.stack([ls, le], axis=1)


def _search_regex_filtered(params: SearchParams, data: bytes, literals,
                           force_python: bool = False):
    """Device literal prefilter + exact regexec over candidate lines only.
    Returns None when the candidate set is too dense to pay off (caller
    falls back to the parallel/sequential full-text engines).
    force_python skips BOTH native C stages (the line-range builder and
    the ranges regexec loop) — used by tests to pin the pure-python
    fallbacks against them."""
    from .search import SearchResult, _EMPTY_POS

    n = len(data)
    cflags = REG_EXTENDED | REG_NEWLINE | (
        0 if params.case_sensitive else REG_ICASE
    )
    src = build_regex_source(params)
    PosixRegex(src, cflags)  # raises RegexError with the glibc message

    if params.max_count == 0 and (params.count_lines_mode or params.track_positions):
        return SearchResult(0, _EMPTY_POS, n)

    arr = np.frombuffer(data, np.uint8)
    starts = _union_literal_starts(arr, literals, params.case_sensitive)
    if len(starts) == 0:
        return SearchResult(0, _EMPTY_POS, n)
    ranges = _candidate_line_ranges(arr, starts, force_python=force_python)
    if 2 * int((ranges[:, 1] - ranges[:, 0]).sum()) >= n:
        return None  # dense: the full-text engines win

    mc = params.effective_max_count
    try:
        from ..native import runtime as _native
    except Exception:
        _native = None
    if force_python:
        _native = None
    if _native is not None:
        count, positions = _native.regex_search_ranges(
            src, data, ranges, cflags,
            params.whole_word, params.count_lines_mode,
            params.track_positions, mc,
        )
    else:
        count, positions = _ranges_loop_python(
            src, cflags, data, ranges, params, mc
        )
    if not params.track_positions or params.count_lines_mode:
        positions = _EMPTY_POS
    return SearchResult(count, positions, n)


def _ranges_loop_python(src, cflags, data: bytes, ranges, params, max_count):
    """Pure-Python mirror of krep_regex_search_ranges (no C toolchain)."""
    rx = PosixRegex(src, cflags)
    n = len(data)
    cbuf = ctypes.create_string_buffer(data, n + 1)
    base = ctypes.addressof(cbuf)
    count = 0
    positions: list[tuple[int, int]] = []
    icase = bool(cflags & REG_ICASE)
    for ls, le in ranges.tolist():
        if count >= max_count:
            break
        cur = ls
        # -i NOTEOL quirk: only at the true text end (the reference's
        # window always runs to text_len, so '$' before a '\n' at le < n
        # is unaffected) — see krep_regex_search_ranges in runtime.c
        noteol = REG_NOTEOL if (icase and le == n) else 0
        while cur < le:
            at_line_start = cur == 0 or data[cur - 1] == 0x0A
            hit = rx.exec_at(
                base, cur, le - cur,
                noteol | (0 if at_line_start else REG_NOTBOL),
            )
            if hit is None:
                break
            so, eo = hit
            start, end = cur + so, cur + eo
            if params.whole_word:
                before_ok = start == 0 or not _is_word_byte(data[start - 1])
                after_ok = end >= n or not _is_word_byte(data[end])
                if not (before_ok and after_ok):
                    cur = cur + so + 1
                    continue
            if params.count_lines_mode:
                count += 1  # one range == one line
                break
            count += 1
            if params.track_positions:
                positions.append((start, end))
            if count >= max_count:
                break
            cur += so + 1 if so == eo else eo
    pos_arr = (
        np.asarray(positions, dtype=np.int64).reshape(-1, 2)
        if positions
        else np.zeros((0, 2), np.int64)
    )
    return count, pos_arr


def _search_regex_parallel(params: SearchParams, data: bytes,
                           threads: int | None = None):
    import multiprocessing as mp

    from .search import SearchResult, _EMPTY_POS

    # validate the regex in-process first so compile errors raise here
    cflags = REG_EXTENDED | REG_NEWLINE | (0 if params.case_sensitive else REG_ICASE)
    PosixRegex(build_regex_source(params), cflags)

    n = len(data)
    workers = min(os.cpu_count() or 1, 32)
    if threads is not None:
        # -t caps regex chunk workers like the reference's thread count
        # caps its regex chunk threads (krep.c:2816-2905)
        workers = max(1, min(workers, threads))
    ranges = _parallel_chunks(n, data, workers)

    global _G
    _G = (data, params)
    try:
        ctx = mp.get_context("fork")
        with ctx.Pool(min(workers, len(ranges))) as pool:
            results = pool.map(_worker_chunk, ranges)
    finally:
        _G = None

    # chunks are line-aligned, so per-chunk counts/line-dedups are
    # independent; -m truncates the merged stream in order.
    mc = params.effective_max_count
    total = 0
    positions = []
    for cnt, pos in results:
        if total >= mc:
            break
        take = min(cnt, mc - total)
        total += take
        if pos:
            positions.extend(pos[:take])
    pos_arr = (
        np.asarray(positions, dtype=np.int64).reshape(-1, 2)
        if positions
        else _EMPTY_POS
    )
    return SearchResult(total, pos_arr, n)


def _search_regex_seq(
    params: SearchParams, data: bytes, force_python: bool = False,
    drop_end: bool = False,
) -> "SearchResult":
    """force_python skips the native C loop — used by tests to pin the
    no-toolchain ctypes fallback against it (the two implement the same
    krep.c:1389-1579 contract and must never diverge). drop_end: chunk
    boundary ownership (see _worker_chunk)."""
    from .search import SearchResult, _EMPTY_POS

    n = len(data)
    # Native C loop (krep_tpu/native/runtime.c): same algorithm, no
    # per-match Python round trip. The in-process compile below validates
    # the pattern first so compile errors carry the glibc message.
    try:
        from ..native import runtime as _native
    except Exception:
        _native = None
    if force_python:
        _native = None
    if _native is not None:
        cflags = REG_EXTENDED | REG_NEWLINE | (
            0 if params.case_sensitive else REG_ICASE
        )
        src = build_regex_source(params)
        PosixRegex(src, cflags)  # raises RegexError with the real message
        if params.max_count == 0 and (params.count_lines_mode or params.track_positions):
            return SearchResult(0, _EMPTY_POS, n)
        count, positions = _native.regex_search(
            src,
            bytes(data),
            cflags,
            params.whole_word,
            params.count_lines_mode,
            params.track_positions,
            params.effective_max_count,
            drop_end=drop_end,
        )
        if not params.track_positions or params.count_lines_mode:
            positions = _EMPTY_POS
        return SearchResult(count, positions, n)

    cflags = REG_EXTENDED | REG_NEWLINE | (0 if params.case_sensitive else REG_ICASE)
    rx = PosixRegex(build_regex_source(params), cflags)

    max_count = params.effective_max_count
    if params.max_count == 0 and (params.count_lines_mode or params.track_positions):
        return SearchResult(0, _EMPTY_POS, n)

    if n == 0:
        if rx.matches_empty():
            pos = np.array([[0, 0]], dtype=np.int64) if params.track_positions else _EMPTY_POS
            return SearchResult(1, pos, 0)
        return SearchResult(0, _EMPTY_POS, 0)

    cbuf = ctypes.create_string_buffer(data, n + 1)  # NUL-terminated like the
    # reference's read-not-mmap regex buffer (krep.c:2632-2634)
    base = ctypes.addressof(cbuf)

    count = 0
    cur = 0
    last_line = -1
    positions: list[tuple[int, int]] = []
    # Reference quirk (krep.c:1420): the CFLAG REG_ICASE (2) leaks into
    # eflags where 2 is REG_NOTEOL, so under -i '$' never matches at the
    # absolute text end (verified against the binary).
    icase_noteol = 0 if params.case_sensitive else REG_NOTEOL
    while cur < n or (cur == 0 and n == 0):
        rem = n - cur
        at_line_start = cur == 0 or data[cur - 1] == 0x0A
        eflags = icase_noteol | (0 if at_line_start else REG_NOTBOL)
        hit = rx.exec_at(base, cur, rem, eflags)
        if hit is None:
            break
        so, eo = hit
        start, end = cur + so, cur + eo
        if drop_end and start >= n:
            break  # chunk-boundary ownership: the next chunk counts it

        if params.whole_word:
            before_ok = start == 0 or not _is_word_byte(data[start - 1])
            after_ok = end >= n or not _is_word_byte(data[end])
            if not (before_ok and after_ok):
                cur = min(cur + so + 1, n)
                continue

        if params.count_lines_mode:
            ls = data.rfind(b"\n", 0, start) + 1
            if ls != last_line:
                count += 1
                last_line = ls
                if count >= max_count:
                    break
                le = data.find(b"\n", ls)
                cur = n if le == -1 else le + 1
                continue
        else:
            count += 1
            if params.track_positions:
                positions.append((start, end))

        if count >= max_count:
            break

        cur = min(cur + (so + 1 if so == eo else eo), n)

    pos_arr = (
        np.asarray(positions, dtype=np.int64).reshape(-1, 2)
        if positions
        else _EMPTY_POS
    )
    return SearchResult(count, pos_arr, n)
