"""ctypes bindings for the native host runtime (runtime.c).

The shared library is built on first import with the system compiler into a
user cache dir (content-addressed by source hash, so edits rebuild). All
callers degrade gracefully to numpy/python fallbacks if the toolchain is
unavailable — see engine/resolve.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "runtime.c")


def _build() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    h = hashlib.sha256(src).hexdigest()[:16]
    cache = os.environ.get(
        "KREP_TPU_CACHE_DIR", os.path.expanduser("~/.cache/krep_tpu")
    )
    os.makedirs(cache, exist_ok=True)
    sopath = os.path.join(cache, f"krep_runtime_{h}.so")
    if os.path.exists(sopath):
        return sopath
    cc = os.environ.get("CC") or shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None:
        raise RuntimeError("no C compiler")
    with tempfile.TemporaryDirectory() as td:
        tmp = os.path.join(td, "krep_runtime.so")
        subprocess.run(
            [cc, "-O3", "-march=native", "-pthread", "-shared", "-fPIC",
             _SRC, "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, sopath) if os.name != "nt" else shutil.move(tmp, sopath)
    return sopath


_lib = ctypes.CDLL(_build())

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

_lib.krep_greedy_nonoverlap.restype = ctypes.c_int64
_lib.krep_greedy_nonoverlap.argtypes = [_i64p, ctypes.c_int64, ctypes.c_int64, _i64p]
_lib.krep_memchr_short_o_walk.restype = ctypes.c_int64
_lib.krep_memchr_short_o_walk.argtypes = [
    _i64p, _u8p, _u8p, ctypes.c_int64, ctypes.c_int64, _i64p,
]
_lib.krep_distinct_lines.restype = ctypes.c_int64
_lib.krep_distinct_lines.argtypes = [_i64p, ctypes.c_int64, _i64p, ctypes.c_int64]
_lib.krep_linenos.restype = ctypes.c_int64
_lib.krep_linenos.argtypes = [
    _u8p, ctypes.c_int64, _i64p, ctypes.c_int64, _i64p,
]
_lib.krep_bits_to_starts.restype = ctypes.c_int64
_lib.krep_bits_to_starts.argtypes = [
    _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
]
_lib.krep_line_ranges.restype = ctypes.c_int64
_lib.krep_line_ranges.argtypes = [
    _u8p, ctypes.c_int64, _i64p, ctypes.c_int64, _i64p,
]
_lib.krep_render_only_matching.restype = ctypes.c_int64
_lib.krep_render_only_matching.argtypes = [
    _u8p, ctypes.c_int64, _i64p, ctypes.c_int64,
    ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
]


class _RegexResult(ctypes.Structure):
    _fields_ = [
        ("count", ctypes.c_int64),
        ("n_pos", ctypes.c_int64),
        ("pos", ctypes.POINTER(ctypes.c_int64)),
        ("error", ctypes.c_int),
    ]


_lib.krep_regex_search.restype = ctypes.c_int64
_lib.krep_regex_search.argtypes = [
    ctypes.c_char_p,          # pattern (NUL-terminated)
    ctypes.c_char_p,          # text (bytes; CPython bytes are NUL-terminated)
    ctypes.c_int64,           # text_len
    ctypes.c_int,             # cflags
    ctypes.c_int,             # whole_word
    ctypes.c_int,             # count_lines_mode
    ctypes.c_int,             # track_positions
    ctypes.c_int64,           # max_count
    ctypes.c_int,             # drop_end (chunk-boundary ownership)
    ctypes.POINTER(_RegexResult),
]
_lib.krep_regex_search_ranges.restype = ctypes.c_int64
_lib.krep_regex_search_ranges.argtypes = [
    ctypes.c_char_p,          # pattern (NUL-terminated)
    ctypes.c_char_p,          # text
    ctypes.c_int64,           # text_len
    _i64p,                    # ranges (k, 2) line (start, end) pairs
    ctypes.c_int64,           # n_ranges
    ctypes.c_int,             # cflags
    ctypes.c_int,             # whole_word
    ctypes.c_int,             # count_lines_mode
    ctypes.c_int,             # track_positions
    ctypes.c_int64,           # max_count
    ctypes.POINTER(_RegexResult),
]
_lib.krep_free.restype = None
_lib.krep_free.argtypes = [ctypes.c_void_p]

_lib.krep_literal_scan.restype = ctypes.c_int64
_lib.krep_literal_scan.argtypes = [
    _u8p,                      # text
    ctypes.c_int64,            # n
    ctypes.c_char_p,           # pattern
    ctypes.c_int64,            # m
    ctypes.c_int,              # case_insensitive
    ctypes.c_int,              # whole_word
    ctypes.c_int,              # count_lines_mode
    ctypes.c_int,              # track_positions
    ctypes.c_int64,            # max_count (<0 = unlimited)
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),  # out positions
]
_lib.krep_batch_literal_counts.restype = None
_lib.krep_batch_literal_counts.argtypes = [
    _u8p,                      # batch buffer
    _i64p,                     # (start, end) bounds, 2*nfiles
    ctypes.c_int64,            # nfiles
    ctypes.c_char_p,           # pattern
    ctypes.c_int64,            # m
    ctypes.c_int,              # case_insensitive
    ctypes.c_int,              # whole_word
    ctypes.c_int,              # count_lines_mode
    _i64p,                     # out counts
]
_lib.krep_batch_literal_counts_mt.restype = None
_lib.krep_batch_literal_counts_mt.argtypes = (
    _lib.krep_batch_literal_counts.argtypes[:-1]
    + [ctypes.c_int]           # threads
    + [_i64p]                  # out counts
)
_lib.krep_memchr_short_o_scan.restype = ctypes.c_int64
_lib.krep_memchr_short_o_scan.argtypes = [
    _u8p,                      # text
    ctypes.c_int64,            # n
    ctypes.c_char_p,           # pattern
    ctypes.c_int64,            # m
    ctypes.c_int,              # case_insensitive
    ctypes.c_int,              # whole_word
    ctypes.c_int64,            # max_count (<0 = unlimited)
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),  # out positions
]


def literal_scan(
    text: np.ndarray,
    pattern: bytes,
    case_insensitive: bool,
    whole_word: bool,
    count_lines: bool = False,
    track_positions: bool = False,
    max_count: int | None = None,
) -> tuple[int, np.ndarray | None]:
    """One-pass native ALL-overlap literal scan (the host fast path below
    the device break-even — see ops/hostscan.py). Returns (count, starts):
    count is the matched-line count when count_lines, else the ALL match
    count; starts is the int64 all-starts array when track_positions, else
    None. max_count caps counting modes only (ignored when tracking)."""
    out = ctypes.POINTER(ctypes.c_int64)()
    text = np.ascontiguousarray(text, np.uint8)
    cnt = _lib.krep_literal_scan(
        text,
        text.shape[0],
        pattern,
        len(pattern),
        int(case_insensitive),
        int(whole_word),
        int(count_lines),
        int(track_positions),
        -1 if max_count is None else max_count,
        ctypes.byref(out),
    )
    try:
        if cnt < 0:
            raise MemoryError("krep_literal_scan: allocation failed")
        if not track_positions:
            return int(cnt), None
        if cnt and out:
            flat = np.ctypeslib.as_array(out, shape=(int(cnt),))
            return int(cnt), np.array(flat, dtype=np.int64)
        return int(cnt), np.zeros(0, np.int64)
    finally:
        if out:
            _lib.krep_free(out)


def batch_literal_counts(
    buf: np.ndarray,
    bounds: np.ndarray,
    pattern: bytes,
    case_insensitive: bool,
    whole_word: bool,
    count_lines: bool,
    threads: int | None = None,
) -> np.ndarray:
    """Per-file counts over a concatenated batch buffer in one native call.
    bounds: (nfiles, 2) int64 (start, end) offsets; each file scans with
    text-edge semantics (the per-file launches at krep.c:3402-3430).
    threads: worker threads for the scan (files partition by byte volume;
    results are position-identical regardless). None = KREP_TPU_HOST_THREADS
    env, else min(8, cpu count); the C side falls back to the serial loop
    below a 1 MiB volume floor."""
    buf = np.ascontiguousarray(buf, np.uint8)
    bounds = np.ascontiguousarray(bounds, np.int64)
    nfiles = bounds.shape[0]
    out = np.empty(nfiles, np.int64)
    if threads is None:
        env = os.environ.get("KREP_TPU_HOST_THREADS")
        threads = int(env) if env else min(8, os.cpu_count() or 1)
    _lib.krep_batch_literal_counts_mt(
        buf,
        bounds.reshape(-1),
        nfiles,
        pattern,
        len(pattern),
        int(case_insensitive),
        int(whole_word),
        int(count_lines),
        int(threads),
        out,
    )
    return out


def memchr_short_o_scan(
    text: np.ndarray,
    pattern: bytes,
    case_insensitive: bool,
    whole_word: bool,
    max_count: int | None,
) -> np.ndarray:
    """One-pass native memchr_short -o scan (krep.c:4371-4503) over a
    contiguous uint8 array; returns kept start offsets (int64)."""
    out = ctypes.POINTER(ctypes.c_int64)()
    cnt = _lib.krep_memchr_short_o_scan(
        np.ascontiguousarray(text, np.uint8),
        text.shape[0],
        pattern,
        len(pattern),
        int(case_insensitive),
        int(whole_word),
        -1 if max_count is None else max_count,
        ctypes.byref(out),
    )
    try:
        if cnt < 0:
            raise MemoryError("krep_memchr_short_o_scan: allocation failed")
        if cnt and out:
            flat = np.ctypeslib.as_array(out, shape=(cnt,))
            return np.array(flat, dtype=np.int64)
        return np.zeros(0, np.int64)
    finally:
        if out:
            _lib.krep_free(out)


def regex_search(
    pattern: bytes,
    text: bytes,
    cflags: int,
    whole_word: bool,
    count_lines_mode: bool,
    track_positions: bool,
    max_count: int,
    drop_end: bool = False,
):
    """Full reference regex loop in C. Returns (count, positions (k,2) int64).
    Raises ValueError on compile error. drop_end: see krep_regex_search —
    set for every parallel chunk but the last."""
    res = _RegexResult()
    rc = _lib.krep_regex_search(
        pattern, text, len(text), cflags,
        int(whole_word), int(count_lines_mode), int(track_positions),
        max_count, int(drop_end), ctypes.byref(res),
    )
    try:
        if res.error == 1:
            raise ValueError("regex compile error")
        if res.error == 2:
            # mirror the reference: regexec failure mid-scan warns and
            # returns the partial count (krep.c:1444-1453)
            import sys

            sys.stderr.write("krep: Regex execution error (partial results)\n")
        if res.n_pos and res.pos:
            flat = np.ctypeslib.as_array(res.pos, shape=(res.n_pos * 2,))
            positions = np.array(flat, dtype=np.int64).reshape(-1, 2)
        else:
            positions = np.zeros((0, 2), np.int64)
    finally:
        if res.pos:
            _lib.krep_free(res.pos)
    return int(res.count), positions


def regex_search_ranges(
    pattern: bytes,
    text: bytes,
    ranges: np.ndarray,
    cflags: int,
    whole_word: bool,
    count_lines_mode: bool,
    track_positions: bool,
    max_count: int,
):
    """Reference regex loop restricted to candidate line ranges (the
    TPU-filtered ERE path). ranges: (k, 2) int64 absolute [start, end) per
    line. Returns (count, positions (k,2) int64 absolute)."""
    res = _RegexResult()
    ranges = np.ascontiguousarray(ranges, np.int64)
    _lib.krep_regex_search_ranges(
        pattern, text, len(text), ranges.reshape(-1), len(ranges), cflags,
        int(whole_word), int(count_lines_mode), int(track_positions),
        max_count, ctypes.byref(res),
    )
    try:
        if res.error == 1:
            raise ValueError("regex compile error")
        if res.error == 2:
            import sys

            sys.stderr.write("krep: Regex execution error (partial results)\n")
        if res.n_pos and res.pos:
            flat = np.ctypeslib.as_array(res.pos, shape=(res.n_pos * 2,))
            positions = np.array(flat, dtype=np.int64).reshape(-1, 2)
        else:
            positions = np.zeros((0, 2), np.int64)
    finally:
        if res.pos:
            _lib.krep_free(res.pos)
    return int(res.count), positions


def greedy_nonoverlap(starts: np.ndarray, m: int) -> np.ndarray:
    starts = np.ascontiguousarray(starts, np.int64)
    out = np.empty_like(starts)
    k = _lib.krep_greedy_nonoverlap(starts, len(starts), m, out)
    return out[:k]


def memchr_short_o_walk(
    cands: np.ndarray, verified: np.ndarray, word_ok: np.ndarray, m: int
) -> np.ndarray:
    cands = np.ascontiguousarray(cands, np.int64)
    verified = np.ascontiguousarray(verified, np.uint8)
    word_ok = np.ascontiguousarray(word_ok, np.uint8)
    out = np.empty_like(cands)
    k = _lib.krep_memchr_short_o_walk(cands, verified, word_ok, len(cands), m, out)
    return out[:k]


def bits_to_starts(packed: np.ndarray, n: int) -> np.ndarray:
    """Little-endian bit-packed mask → sorted set-bit positions < n, one
    popcount pass to size + one ctz-expansion pass (no n-byte unpacked
    temp)."""
    packed = np.ascontiguousarray(packed, np.uint8)
    cap = _lib.krep_bits_to_starts(packed, len(packed), n, None)
    out = np.empty(int(cap), np.int64)
    k = _lib.krep_bits_to_starts(
        packed, len(packed), n, out.ctypes.data if cap else None
    )
    return out[:k]


def line_ranges(text: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Distinct (line_start, line_end) pairs containing the SORTED
    positions; end excludes the '\\n'. Touches only candidate lines."""
    text = np.ascontiguousarray(text, np.uint8)
    starts = np.ascontiguousarray(starts, np.int64)
    out = np.empty((len(starts), 2), np.int64)
    nr = _lib.krep_line_ranges(
        text, text.shape[0], starts, len(starts), out.reshape(-1)
    )
    return out[:nr]


def render_only_matching(
    text: np.ndarray, positions: np.ndarray, filename: bytes | None, fd: int
) -> int:
    """Stream the no-color -o record stream for SORTED (start, end) pairs
    to a file descriptor in one C pass (incremental linenos + 8 MB batch
    writes, krep.c:517-793). Returns records written, -1 on write error."""
    text = np.ascontiguousarray(text, np.uint8)
    positions = np.ascontiguousarray(positions, np.int64)
    return int(
        _lib.krep_render_only_matching(
            text,
            text.shape[0],
            positions.reshape(-1),
            len(positions),
            filename,
            len(filename) if filename is not None else 0,
            fd,
        )
    )


def linenos(text: np.ndarray, starts: np.ndarray) -> tuple[np.ndarray, int]:
    """1-based line numbers for SORTED start offsets, one sequential text
    pass (krep.c:656-677's incremental counting). Returns (linenos int64,
    last_newline_offset or -1)."""
    text = np.ascontiguousarray(text, np.uint8)
    starts = np.ascontiguousarray(starts, np.int64)
    out = np.empty(len(starts), np.int64)
    last_nl = _lib.krep_linenos(text, text.shape[0], starts, len(starts), out)
    return out, int(last_nl)


def distinct_lines(starts: np.ndarray, newlines: np.ndarray) -> int:
    starts = np.ascontiguousarray(starts, np.int64)
    newlines = np.ascontiguousarray(newlines, np.int64)
    return int(_lib.krep_distinct_lines(starts, len(starts), newlines, len(newlines)))
