"""Parity of the native host post-pass helpers against their numpy
formulations (the fallback implementations). These helpers exist because
the numpy versions cost tens of seconds at positions-at-scale volumes
(BENCH_NOTES.md round 3): krep_linenos replaces a full newline-position
array + per-match binary search (krep.c:656-677's incremental counting),
krep_bits_to_starts replaces np.unpackbits + flatnonzero, and
krep_line_ranges replaces a full-text newline scan in the regex
prefilter (krep.c:363-415's line finding, per candidate)."""

import numpy as np
import pytest

native = pytest.importorskip("krep_tpu.native.runtime")


def _rand_text(rng, n, nl_p=0.05):
    arr = rng.integers(32, 127, n, dtype=np.uint8)
    arr[rng.random(n) < nl_p] = 10
    return arr


def test_linenos_matches_searchsorted():
    rng = np.random.default_rng(11)
    for n in (0, 1, 37, 1000, 65536):
        text = _rand_text(rng, n)
        k = min(n, 257)
        starts = np.sort(rng.integers(0, max(n, 1), k).astype(np.int64))
        got, last_nl = native.linenos(text, starts)
        nl = np.flatnonzero(text == 10)
        want = np.searchsorted(nl, starts, side="left") + 1
        assert np.array_equal(got, want), n
        assert last_nl == (int(nl[-1]) if len(nl) else -1)


def test_linenos_start_at_newline_and_past_end():
    text = np.frombuffer(b"ab\ncd\n", np.uint8)
    starts = np.array([0, 2, 3, 5, 6, 99], np.int64)
    got, last_nl = native.linenos(text, starts)
    # a start AT a '\n' belongs to the line it terminates ('left' search)
    assert got.tolist() == [1, 1, 2, 2, 3, 3]
    assert last_nl == 5


def test_bits_to_starts_matches_unpackbits():
    rng = np.random.default_rng(12)
    for nbytes in (0, 1, 7, 8, 9, 4096, 40001):
        packed = rng.integers(0, 256, nbytes, dtype=np.uint8)
        for n in (0, 3, nbytes * 8 - 5, nbytes * 8):
            if n < 0:
                continue
            got = native.bits_to_starts(packed, n)
            bits = np.unpackbits(packed, bitorder="little")
            want = np.flatnonzero(bits[:n]).astype(np.int64)
            assert np.array_equal(got, want), (nbytes, n)


def test_line_ranges_matches_numpy():
    rng = np.random.default_rng(13)
    for n in (1, 29, 1000, 65536):
        arr = _rand_text(rng, n, nl_p=0.08)
        k = min(n, 301)
        starts = np.unique(rng.integers(0, n, k).astype(np.int64))
        got = native.line_ranges(arr, starts)
        nl = np.flatnonzero(arr == 10)
        li = np.unique(np.searchsorted(nl, starts, side="left"))
        ls = np.zeros(len(li), np.int64)
        p = li > 0
        ls[p] = nl[li[p] - 1] + 1
        le = np.full(len(li), n, np.int64)
        inb = li < len(nl)
        le[inb] = nl[li[inb]]
        want = np.stack([ls, le], axis=1)
        assert np.array_equal(got, want), n


def test_line_ranges_no_trailing_newline():
    arr = np.frombuffer(b"abc\ndef", np.uint8)
    got = native.line_ranges(arr, np.array([1, 5], np.int64))
    assert got.tolist() == [[0, 3], [4, 7]]


def _py_render(buf, positions, fname):
    import io
    from krep_tpu.output import printer

    out = io.BytesIO()  # BytesIO has no fileno -> python vectorized path
    printer.print_only_matching(out, buf, positions, fname, False)
    return out.getvalue()


def _c_render(buf, positions, fname, tmp_path):
    from krep_tpu.output import printer

    p = tmp_path / "out.bin"
    with open(p, "wb") as f:
        printer.print_only_matching(f, buf, positions, fname, False)
    return p.read_bytes()


def test_render_only_matching_fd_parity(tmp_path):
    rng = np.random.default_rng(21)
    n = 200_000
    buf = _rand_text(rng, n, nl_p=0.03)
    starts = np.sort(rng.choice(n - 8, 6000, replace=False)).astype(np.int64)
    lens = rng.integers(1, 8, len(starts))
    positions = np.stack([starts, starts + lens], axis=1)
    for fname in (None, "some/file.txt"):
        want = _py_render(buf, positions, fname)
        got = _c_render(buf, positions, fname, tmp_path)
        assert got == want, fname
        assert b"\n:" not in want.split(b":", 1)[1][:0]  # sanity no-op


def test_render_only_matching_fd_quirk_and_span_newlines(tmp_path):
    # matches past the last newline must inherit the stale lineno, and
    # '\n' inside a span renders as ' ' (krep.c:736, 621-653)
    rng = np.random.default_rng(22)
    body = _rand_text(rng, 120_000, nl_p=0.05)
    tail = np.frombuffer(b"tail-without-newline" * 400, np.uint8)
    buf = np.concatenate([body, tail])
    n = len(buf)
    starts = np.sort(
        rng.choice(n - 30, 5500, replace=False)
    ).astype(np.int64)
    positions = np.stack([starts, starts + 25], axis=1)  # spans cross '\n'
    want = _py_render(buf, positions, None)
    got = _c_render(buf, positions, None, tmp_path)
    assert got == want


def test_render_only_matching_fd_huge_match(tmp_path):
    # a single match longer than the 8 MB batch buffer streams in chunks
    rng = np.random.default_rng(23)
    buf = _rand_text(rng, 9_500_000, nl_p=0.001)
    positions = np.zeros((4101, 2), np.int64)
    positions[:, 0] = np.arange(4101)
    positions[:, 1] = positions[:, 0] + 5
    positions[-1] = (100, 9_100_000)  # 9.1 MB span
    positions = positions[np.argsort(positions[:, 0], kind="stable")]
    want = _py_render(buf, positions, "f")
    got = _c_render(buf, positions, "f", tmp_path)
    assert got == want


def test_render_only_matching_closed_pipe_raises():
    # the C pass reports a failed write() as -1; the printer must surface
    # it as BrokenPipeError so cli.main exits 141 like the buffered path
    # (SIGPIPE-death parity with the reference binary)
    import os

    import pytest

    from krep_tpu.output import printer

    rng = np.random.default_rng(24)
    buf = _rand_text(rng, 50_000, nl_p=0.03)
    starts = np.sort(rng.choice(49_000, 5000, replace=False)).astype(np.int64)
    positions = np.stack([starts, starts + 3], axis=1)
    r, w = os.pipe()
    os.close(r)
    import signal

    old = signal.signal(signal.SIGPIPE, signal.SIG_IGN)
    try:
        with open(w, "wb", buffering=0) as f, pytest.raises(BrokenPipeError):
            printer.print_only_matching(f, buf, positions, None, False)
    finally:
        signal.signal(signal.SIGPIPE, old)


@pytest.mark.parametrize("count_lines", [False, True])
@pytest.mark.parametrize("threads", [2, 5, 64])
def test_batch_counts_mt_matches_serial(count_lines, threads):
    # the threaded batch scan partitions files by byte volume across
    # pthreads; results must be slot-identical to the serial loop for any
    # thread count (including threads > nfiles). Volume > 1 MiB so the
    # C-side floor doesn't short-circuit to serial.
    rng = np.random.default_rng(31)
    sizes = rng.integers(200, 9_000, 300)
    bounds, off = [], 0
    chunks = []
    for s in sizes:
        b = _rand_text(rng, int(s), nl_p=0.02)
        # sprinkle real matches
        for p in rng.integers(0, max(1, s - 4), 5):
            b[p : p + 3] = np.frombuffer(b"the", np.uint8)
        chunks.append(b)
        bounds.append((off, off + int(s)))
        off += int(s) + 7
    buf = np.zeros(off, np.uint8)
    for (lo, hi), b in zip(bounds, chunks):
        buf[lo:hi] = b
    assert off > (1 << 20)
    bounds = np.array(bounds, np.int64)
    serial = native.batch_literal_counts(
        buf, bounds, b"the", False, False, count_lines, threads=1
    )
    mt = native.batch_literal_counts(
        buf, bounds, b"the", False, False, count_lines, threads=threads
    )
    assert np.array_equal(serial, mt)
    assert serial.sum() > 0


def test_swar_candidate_borrow_false_positive():
    # regression (round-5 soak rig): the borrow-prone SWAR zero-byte
    # detect ((x-ONES) & ~x & HIGH) false-flagged byte k when byte k held
    # 0x01 and byte k-1 was a TRUE zero — 'bcbb' scanning 'bb' flagged
    # the 'c' (=='b'^0x01) right after the true 'b' hit, and the
    # first-byte-anchored verify accepted "cb" as a match. Pin the exact
    # carry-less detect across both native scanners and all three result
    # modes, at every alignment.
    for shift in range(9):
        pad = b"z" * shift
        t = pad + b"bcbbaa  d"  # needs >= 9 bytes so the pair-AND path runs
        arr = np.frombuffer(t, np.uint8)
        want = [i for i in range(len(t) - 1) if t[i : i + 2] == b"bb"]
        for ci in (False, True):
            cnt, pos = native.literal_scan(
                arr, b"bb", ci, False, count_lines=False,
                track_positions=True,
            )
            assert pos.tolist() == want, (shift, ci)
            assert cnt == len(want)
        cnt, _ = native.literal_scan(
            arr, b"bb", False, False, count_lines=True,
            track_positions=False,
        )
        assert cnt == 1  # single line
    # memchr_short -o walk quirk path uses the same candidate machinery
    t = b"bcbbaa  d"
    out = native.memchr_short_o_scan(
        np.frombuffer(t, np.uint8), b"bb", False, False, None
    )
    assert out.tolist() == [2]
