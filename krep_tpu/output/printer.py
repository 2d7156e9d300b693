"""Output engine — byte-exact with print_matching_items (krep.c:461-1078).

Formats (verified against the reference binary):
  default   : [FILE:]LINE_TEXT, one print per matched line (dedup by line)
  -o        : [FILE:]LINENO:MATCH_TEXT per match, 1-based line numbers,
              '\\n' inside a match rendered as ' ' (krep.c:736-753)
  counting  : [FILE:]N (done by the CLI, not here)

Color mode mirrors the ANSI palette of krep.h:33-45 and the exact emission
order probed from the binary: filename in FILENAME + reset, ':' in SEPARATOR
(no reset), then TEXT-colored line with MATCH-colored spans (default mode)
or LINE_NUMBER-colored "N:" + reset + MATCH-colored match (-o mode).
"""

from __future__ import annotations

import numpy as np

try:
    from ..native import runtime as _native
except Exception:  # pragma: no cover - toolchain-less environments
    _native = None

BATCH_BYTES = 8 * 1024 * 1024  # output batch size (krep.c:520)

RESET = b"\033[0m"
FILENAME = b"\033[1;38;5;81m"
SEPARATOR = b"\033[38;5;244m"
LINE_NUMBER = b"\033[1;38;5;111m"
MATCH = b"\033[1;38;5;222m"
TEXT = b"\033[38;5;252m"


def _as_bytes(text) -> np.ndarray:
    if isinstance(text, np.ndarray):
        return text
    return np.frombuffer(text, dtype=np.uint8)


def newline_positions(text) -> np.ndarray:
    return np.flatnonzero(_as_bytes(text) == 10)


def _tobytes(buf: np.ndarray, a: int, b: int) -> bytes:
    return _as_bytes(buf)[a:b].tobytes()


def print_only_matching(
    out,
    text,
    positions: np.ndarray,
    filename: str | None,
    color: bool,
    max_count: int | None = None,
):
    """-o mode: [FILE:]LINENO:MATCH per match (krep.c:517-793)."""
    buf = _as_bytes(text)
    if len(positions) and buf.shape[0] > 0:
        # the reference skips matches starting at/after text end (a
        # zero-length regex match after the final '\n') and clamps ends
        # (krep.c:609-615) — skipped matches don't count toward -m.
        # n == 0 is exempt: the empty-file special case (krep.c:2419-2513)
        # prints its [0,0] match as an empty record.
        valid = (positions[:, 0] < buf.shape[0]) & (
            positions[:, 0] <= positions[:, 1]
        )
        if not valid.all():
            positions = positions[valid]
        if positions[:, 1].max(initial=0) > buf.shape[0]:
            positions = positions.copy()
            np.minimum(positions[:, 1], buf.shape[0], out=positions[:, 1])
    if max_count is not None:
        positions = positions[:max_count]
    if len(positions) == 0:
        return
    starts = positions[:, 0]
    # stdin/-s positions arrive in AC emission order (ascending end, NOT
    # start — params.sorted_positions); the native passes below walk the
    # text sequentially and require monotonic starts
    mono = len(starts) < 2 or bool(np.all(starts[1:] >= starts[:-1]))
    fn = filename.encode() if filename is not None else None
    if not color and len(positions) > 4096 and _native is not None and mono:
        try:
            fd = out.fileno()
        except (AttributeError, OSError):
            fd = None
        if fd is not None:
            # one C pass straight to the fd: incremental linenos + itoa +
            # body copy at memcpy speed (krep.c:517-793) — skips the
            # host-side lineno arrays entirely
            out.flush()
            if _native.render_only_matching(buf, positions, fn, fd) < 0:
                # C pass reports write failure as -1; surface it the same
                # way the buffered python path would (cli.py catches it)
                raise BrokenPipeError(32, "write failed in -o render")
            return
    if _native is not None and mono:
        # one sequential text pass (starts are reference-sorted); no
        # newline-position array, no per-match binary search — those cost
        # tens of seconds at tens of millions of matches
        linenos, last_nl = _native.linenos(buf, starts)
    else:
        nl = newline_positions(buf)
        linenos = np.searchsorted(nl, starts, side="left") + 1
        last_nl = int(nl[-1]) if len(nl) else -1
    if len(positions) > 10 and last_nl >= 0:
        # Reproduce the reference's binary-search quirk (krep.c:621-653):
        # for a match beyond the LAST newline the search exits without
        # updating its index, so such matches inherit the PRECEDING
        # match's line index (stale), not the true final line number —
        # a forward fill in processing order (emission order on stdin/-s)
        beyond = starts > last_nl
        if beyond.any():
            not_beyond = ~beyond
            idx = np.where(not_beyond, np.arange(len(linenos)), -1)
            np.maximum.accumulate(idx, out=idx)
            linenos = np.where(
                beyond,
                np.where(idx >= 0, linenos[np.maximum(idx, 0)], 1),
                linenos,
            )

    if not color and len(positions) > 4096:
        _print_only_matching_vectorized(out, buf, positions, linenos, fn)
        return
    # batched emission, mirroring the reference's 8MB O_BATCH buffer
    # (krep.c:520-522, 697-706)
    parts = []
    acc = 0
    for (s, e), ln in zip(positions.tolist(), linenos.tolist()):
        match_text = buf[s:e].tobytes().replace(b"\n", b" ")
        if color:
            if fn is not None:
                parts.append(FILENAME + fn + RESET + SEPARATOR + b":")
            parts.append(
                LINE_NUMBER + str(ln).encode() + b":" + RESET + MATCH + match_text + RESET + b"\n"
            )
        else:
            if fn is not None:
                parts.append(fn + b":")
            parts.append(str(ln).encode() + b":" + match_text + b"\n")
        acc += len(parts[-1])
        if acc >= BATCH_BYTES:
            out.write(b"".join(parts))
            parts, acc = [], 0
    out.write(b"".join(parts))


MAX_MATCHES_PER_LINE = 2048  # krep.c:496-497


def _render_records(buf, starts, lnums, d, L, fn_arr):
    """(k, W) byte matrix of records with d line-number digits and match
    length L: [fn:]lineno:match\\n, all fields filled vectorized."""
    pre = len(fn_arr) if fn_arr is not None else 0
    W = pre + d + 1 + L + 1
    rec = np.empty((len(starts), W), np.uint8)
    col = 0
    if fn_arr is not None:
        rec[:, :pre] = fn_arr
        col = pre
    # uint32 divmod is ~7x faster than int64 at tens of millions of rows;
    # the strided uint8 column assignment casts in the same pass
    v = lnums.astype(np.uint32 if lnums[-1:].max(initial=0) < 1 << 32 else np.int64)
    for j in range(d - 1, -1, -1):
        rec[:, col + j] = 0x30 + (v % 10)
        v //= 10
    col += d
    rec[:, col] = 0x3A  # ':'
    col += 1
    # per-column 1D gathers: a 2D fancy index materializes a (k, L) int64
    # index matrix first (gigabytes at scale)
    for j in range(L):
        cj = buf[starts + j]
        rec[:, col + j] = np.where(cj == 10, 32, cj)  # '\n' → ' ' (krep.c:736)
    rec[:, -1] = 0x0A
    return rec


def _print_only_matching_vectorized(out, buf, positions, linenos, fn):
    """Bulk no-color -o rendering. Line numbers are ascending, so their
    digit counts form ≤10 contiguous runs; within a run, records sharing a
    match length are a fixed-width byte matrix written contiguously —
    no per-record Python work at all for the common single-literal case."""
    starts = positions[:, 0].astype(np.int64)
    mlens = (positions[:, 1] - positions[:, 0]).astype(np.int64)
    ln = linenos.astype(np.int64)
    fn_arr = np.frombuffer(fn + b":", np.uint8) if fn is not None else None

    # digit-run boundaries (linenos ascending)
    bounds = [0]
    for p in range(1, 19):
        b = int(np.searchsorted(ln, 10**p, side="left"))
        if b > bounds[-1]:
            bounds.append(b)
        if b >= len(ln):
            break
    if bounds[-1] != len(ln):
        bounds.append(len(ln))

    for i0, i1 in zip(bounds[:-1], bounds[1:]):
        d = len(str(int(ln[i0])))
        run_lens = mlens[i0:i1]
        # min==max probe instead of np.unique: no sort at tens of millions
        # of rows for the common single-literal case
        # the i0:i1 slice is non-empty by construction (bounds are strictly
        # increasing), so no `initial=` guard — an initial of 0 would make
        # min() return 0 for every nonzero length and defeat the probe
        lo = int(run_lens.min())
        uniq = (
            np.array([lo])
            if lo == int(run_lens.max())
            else np.unique(run_lens)
        )
        if len(uniq) == 1:
            rec = _render_records(
                buf, starts[i0:i1], ln[i0:i1], d, int(uniq[0]), fn_arr
            )
            out.write(rec.tobytes())
        else:
            # rare (multi-pattern): render per length, scatter into order
            pre = len(fn_arr) if fn_arr is not None else 0
            rl = pre + d + 1 + run_lens + 1
            offs = np.concatenate([[0], np.cumsum(rl)])
            seg = np.empty(int(offs[-1]), np.uint8)
            for L in uniq:
                sel = np.flatnonzero(run_lens == L)
                rec = _render_records(
                    buf, starts[i0:i1][sel], ln[i0:i1][sel], d, int(L), fn_arr
                )
                W = rec.shape[1]
                pos = offs[sel][:, None] + np.arange(W)
                seg[pos.reshape(-1)] = rec.reshape(-1)
            out.write(seg.tobytes())


def _print_matching_lines_vectorized(out, buf, positions, lidx, nl, fn) -> bool:
    """Bulk no-color default-mode rendering for the common case: within
    every matched line the (sorted) spans are non-overlapping and inside
    the line bounds, so the emission loop's output is exactly
    `[fn:]line\\n` per matched line — built with one gather, no per-line
    Python. Returns False when any line needs the exact slow loop
    (overlapping spans re-emit bytes, krep.c:963-1001; >2048 spans warn)."""
    n = buf.shape[0]
    starts = positions[:, 0].astype(np.int64)
    ends = positions[:, 1].astype(np.int64)

    uline, first_idx, counts = np.unique(lidx, return_index=True, return_counts=True)
    if counts.max(initial=0) > MAX_MATCHES_PER_LINE:
        return False
    ls = np.zeros(len(uline), np.int64)
    p = uline > 0
    ls[p] = nl[uline[p] - 1] + 1
    le = np.full(len(uline), n, np.int64)
    inb = uline < len(nl)
    le[inb] = nl[uline[inb]]

    # spans sorted by (start, end): non-overlap ⇔ each start ≥ previous
    # end within the same line; bounds ⇔ span ⊆ [ls, le)
    prev_end = np.empty(len(starts), np.int64)
    prev_end[0] = -1
    prev_end[1:] = ends[:-1]
    same_line = np.zeros(len(starts), bool)
    same_line[1:] = lidx[1:] == lidx[:-1]
    if np.any(same_line & (starts < prev_end)):
        return False
    if np.any(starts < np.repeat(ls, counts)) or np.any(ends > np.repeat(le, counts)):
        return False

    if np.any(le == ls):
        return False  # empty matched line (zero-length regex match): rare

    # Single-gather assembly: extend the text with the prefix and a '\n'
    # so every output byte is template[src], with src built as one cumsum
    # of a delta array (1 everywhere, jump corrections at record field
    # boundaries). One O(total) pass + one gather — no per-line work and
    # no (output × fields) index matrices.
    pre = len(fn) + 1 if fn is not None else 0
    lengths = le - ls
    out_len = pre + lengths + 1
    total = int(out_len.sum())
    if total >= (1 << 31) - 2:
        return False
    it = np.int32 if buf.shape[0] + pre + 2 < (1 << 31) else np.int64
    offsets = np.zeros(len(uline), np.int64)
    np.cumsum(out_len[:-1], out=offsets[1:])
    offsets = offsets.astype(it)
    parts = [buf]
    if fn is not None:
        parts.append(np.frombuffer(fn + b":", np.uint8))
    parts.append(np.frombuffer(b"\n", np.uint8))
    template = np.concatenate(parts)
    P0 = it(n)        # prefix bytes start here in template
    P1 = it(n + pre)  # the '\n' byte

    d = np.ones(total, it)
    last = offsets + out_len.astype(it) - 1
    d[last] = P1 - (le - 1).astype(it)
    if pre:
        d[offsets] = P0 - P1
        d[offsets + pre] = (ls - (n + pre - 1)).astype(it)
        d[0] = P0
    else:
        d[offsets] = (ls - int(P1)).astype(it)
        d[0] = it(ls[0])
    src = np.cumsum(d, dtype=it)
    out.write(template[src].tobytes())
    return True


def print_matching_lines(
    out,
    text,
    positions: np.ndarray,
    filename: str | None,
    color: bool,
):
    """Default mode: each matched line once (krep.c:797-1071), reproducing
    the reference's emission loop exactly: every match span (clamped to the
    line) is emitted in full from its own start — OVERLAPPING spans
    re-emit the overlap bytes (krep.c:963-1001), and >2048 matches on one
    line warn and drop the remainder (krep.c:877-917)."""
    import sys

    buf = _as_bytes(text)
    n = buf.shape[0]
    nl = newline_positions(buf)
    if len(positions) and n > 0:
        # skip matches starting at/after text end (krep.c:851-855); n == 0
        # is exempt — the empty-file special case (krep.c:2419-2513)
        # prints its [0,0] match as an empty record
        valid = positions[:, 0] < n
        if not valid.all():
            positions = positions[valid]
    if len(positions) == 0:
        return
    starts = positions[:, 0]
    # line index (0-based) per match; line i spans (nl[i-1]+1 .. nl[i])
    lidx = np.searchsorted(nl, starts, side="left")

    fn = filename.encode() if filename is not None else None
    if not color and len(positions) > 4096:
        # the bulk renderer's per-line grouping (np.unique + repeat)
        # requires line-sorted spans; emission-ordered stdin/-s positions
        # with cross-line matches can violate that — use the exact loop
        lidx_mono = len(lidx) < 2 or bool(np.all(lidx[1:] >= lidx[:-1]))
        if lidx_mono and _print_matching_lines_vectorized(
            out, buf, positions, lidx, nl, fn
        ):
            return
    parts = []
    acc = 0
    last_line = -1
    i = 0
    k = len(positions)
    while i < k:
        li = int(lidx[i])
        if li == last_line:
            i += 1
            continue
        last_line = li
        ls = int(nl[li - 1]) + 1 if li > 0 else 0
        le = int(nl[li]) if li < len(nl) else n
        # collect this line's spans (consecutive in sorted order)
        spans = []
        j = i
        overflow = False
        while j < k and int(lidx[j]) == li:
            if len(spans) >= MAX_MATCHES_PER_LINE:
                overflow = True
            else:
                spans.append((int(positions[j, 0]), int(positions[j, 1])))
            j += 1
        i = j
        if overflow:
            sys.stderr.write(
                f"Warning: Exceeded MAX_MATCHES_PER_LINE ({MAX_MATCHES_PER_LINE}) "
                f"on line starting at offset {ls} in {filename or '<stdin>'}\n"
            )

        if fn is not None:
            if color:
                # the reference's prebuilt prefix ends with the text color
                parts.append(FILENAME + fn + RESET + SEPARATOR + b":" + TEXT)
            else:
                parts.append(fn + b":")
        elif color:
            parts.append(TEXT)
        pos = ls
        emitted = 0
        for s, e in spans:
            s = max(s, ls)
            e = min(e, le)
            if s >= e:
                continue
            if s > pos:
                parts.append(buf[pos:s].tobytes())
            if color:
                parts.append(MATCH + buf[s:e].tobytes() + TEXT)
            else:
                parts.append(buf[s:e].tobytes())
            emitted += e - s
            pos = e
        if pos < le:
            parts.append(buf[pos:le].tobytes())
        parts.append(RESET + b"\n" if color else b"\n")
        acc += le - ls + emitted + 32
        if acc >= BATCH_BYTES:
            out.write(b"".join(parts))
            parts, acc = [], 0
    out.write(b"".join(parts))


def print_count(out, count: int, filename: str | None):
    """Counting modes: [FILE:]N (krep.c:3014-3017, 2203-2206)."""
    if filename is not None:
        out.write(filename.encode() + b":" + str(count).encode() + b"\n")
    else:
        out.write(str(count).encode() + b"\n")
